"""Native (C++) IO kernels with pure-Python fallbacks."""
