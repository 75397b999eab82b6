"""Bridge namespace package (see ../README.md)."""
