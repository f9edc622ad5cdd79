"""Sources & sinks (SURVEY §2.1).

- ``ord``      ORD protobuf datasets: binaryFile scan + mapInPandas
  decode (S1-S5); the protobuf parse is import-gated (ord-schema is
  not in the image) with a deterministic JSON-lines fake for tests —
  the Spark plumbing (scan, pruning, decode fan-out, schema) is real.
- ``solvents`` the solvent dimension table (S8) + molecule-name CSV
  list round-trip (S7).
"""
