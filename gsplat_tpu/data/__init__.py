"""Dataset stack: PLY IO, COLMAP parsing, scene readers, lazy cameras."""
