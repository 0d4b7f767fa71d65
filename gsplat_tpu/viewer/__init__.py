"""Live-viewer networking (SIBR remote-viewer protocol)."""
