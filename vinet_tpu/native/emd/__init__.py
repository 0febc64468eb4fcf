"""FastEMD-equivalent C++ core (built via Makefile, loaded by metrics/emd.py)."""
