"""Test shim: minimal biopython surface for running reference scripts
(biopython is not installed in this environment).  Parity tests only."""
