"""Scalar/array function library: chem UDFs (RDKit-gated), hashing."""
