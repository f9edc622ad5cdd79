"""Native Spark 4 Python DataSource for ORD dataset files —
``spark.read.format("ord").option("path", root).load()``.

This is the SURVEY §4.4 "optional optimisation": a first-class source
that pushes the reference's filename-based pruning
(orderly/extract/main.py:27-51: two-level glob, skip-list, sorted
order) into the source itself. Compared to the
binaryFile + mapInPandas v0 path (sources/ord.py):

- **Planning-time pruning**: skipped files never become input
  partitions — the driver enumerates and filters filenames before any
  task launches, exactly like the reference's ``get_file_names``, but
  the decode still fans out cluster-wide (one partition per file, the
  reference's joblib unit of work, main.py:612-623).
- **No bytes through the JVM**: binaryFile materialises each file as
  a JVM row then Arrow-ships it to Python; here Python workers read
  the file directly, so a 100 TB corpus never double-buffers.
- **Deterministic file order**: partitions are emitted in sorted path
  order (main.py:49-51), so downstream ``monotonically_increasing_id``
  per-file numbering is stable across runs.

Registration is per-session:

    from orderly_spark.sources.ord_datasource import register_ord_source
    register_ord_source(spark)
    df = (spark.read.format("ord")
          .option("path", "/data/ord")
          .option("glob", "*.pb.gz")
          .option("skip_substring", "uspto-grants-2001")
          .load())

Options: ``path`` (root dir, required), ``glob`` (default
``*.pb.gz``), ``skip_substring`` / ``contains_substring`` (filename
pruning, S3), ``decoder`` (``auto``/``proto``/``json`` — same
semantics as the CLI). Local-filesystem listing; a cluster deployment
would swap ``_list_files`` for an fsspec/Hadoop listing with the same
partition contract.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from pathlib import Path

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from orderly_spark.schema import REACTION_SCHEMA

_FIELDS = [f.name for f in REACTION_SCHEMA.fields]


class OrdInputPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


def _list_files(
    root: str,
    glob: str,
    skip_substring: str | None,
    contains_substring: str | None,
) -> list[str]:
    paths = sorted(str(p) for p in Path(root).rglob(glob))
    if contains_substring:
        paths = [p for p in paths if contains_substring in Path(p).name]
    if skip_substring:
        paths = [p for p in paths if skip_substring not in Path(p).name]
    return paths


class OrdDataSourceReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.root = options.get("path")
        if not self.root:
            raise ValueError("ord source requires .option('path', <root dir>)")
        self.glob = options.get("glob", "*.pb.gz")
        self.skip = options.get("skip_substring")
        self.contains = options.get("contains_substring")
        self.decoder_name = options.get("decoder", "auto")
        # mirrors decode_reactions(on_error=...): 'raise' (default,
        # loud abort on a corrupt file) or 'skip' (quarantine; audit
        # the skipped set with sources.ord.decode_errors over a
        # binaryFile scan of the same root)
        self.on_error = options.get("on_error", "raise")
        if self.on_error not in ("raise", "skip"):
            raise ValueError(
                f"ord source: on_error must be 'raise' or 'skip', got {self.on_error!r}"
            )

    def partitions(self) -> Sequence[InputPartition]:
        # planning-time pruning: filtered-out files never become tasks
        return [
            OrdInputPartition(p)
            for p in _list_files(self.root, self.glob, self.skip, self.contains)
        ]

    def read(self, partition: OrdInputPartition) -> Iterator[tuple]:
        # executor-side: import here so the class pickles cheaply
        from orderly_spark.sources.ord import json_decoder, proto_decoder

        # 'auto' = wire-format protobuf (pure-Python codec); 'json'
        # opts into the JSON-lines format explicitly
        decoder = json_decoder if self.decoder_name == "json" else proto_decoder
        path = Path(partition.path)
        content = path.read_bytes()

        def emit(rows: Iterator[dict]) -> Iterator[tuple]:
            for row in rows:
                full = dict(row)
                full["extracted_from_file"] = path.name
                yield tuple(full.get(k) for k in _FIELDS)

        if self.on_error == "skip":
            # quarantine mode must decide skip-vs-keep for the WHOLE
            # file before emitting anything (a decode error mid-file
            # would otherwise leave half its rows in the output), so
            # only this path materialises the file's rows up front
            try:
                rows = list(decoder(path.name, content))
            except Exception:
                return
            yield from emit(iter(rows))
        else:
            # default loud path streams row-by-row: per-task memory is
            # one ROW, not one file (the documented 400k-reaction
            # outlier file never materialises), and an exception
            # aborts the task either way
            yield from emit(decoder(path.name, content))


class OrdDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "ord"

    def schema(self):
        return REACTION_SCHEMA

    def reader(self, schema) -> OrdDataSourceReader:
        return OrdDataSourceReader(self.options)


def register_ord_source(spark) -> None:
    """Idempotently register the 'ord' format on this session."""
    spark.dataSource.register(OrdDataSource)
