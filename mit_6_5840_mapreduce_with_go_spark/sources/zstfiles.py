"""Zstandard shard connector via the Python Data Source API.

Common Crawl publishes its URL indexes and listings as concatenated
zstd frames in ``.zst`` shard files; round 10's entropy layer
(operators/multimodal14.py) made our frame walk TOTAL, so this module
adds the FILE leg: ``spark.read.format("zstfile").load(glob)`` yields
one ROW per standard zstd frame and one INPUT PARTITION per ``.zst``
shard — the same task granularity as the warcfile/wholetext sources
(one map task per file, mirroring the reference's contract;
src/mr/coordinator.go:202-207).  A task retry re-reads exactly one
shard; frame decoding (FSE/Huffman/sequences, checksum verification)
happens executor-side inside the partition read, so shard bytes never
touch the driver.

Row schema carries the decoded frame content (binary) plus the decode
census (frame sizes, block/sequence/literal counts, Huffman table log,
window log, content byte sum) so downstream stages can stay JVM-side.

Scale notes: frames in a shard must be walked sequentially (frame
boundaries are only discoverable by walking), so shard = partition is
the right unit; everything after this source is ordinary DataFrame
code.  Files must be visible to executors (shared FS / object store on
a real cluster).
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class ZstDataSource(DataSource):
    """``format("zstfile")``: one row per zstd frame, one input
    partition per shard file.  Option: ``path`` (local/shared-FS glob,
    also settable via ``.load(path)``)."""

    @classmethod
    def name(cls) -> str:
        return "zstfile"

    def schema(self) -> str:
        return (
            "file string, frame_index long, content binary, "
            "content_len long, content_sum long, n_blocks long, "
            "n_sequences long, n_literals long, huf_tlog long, "
            "window_log long"
        )

    def reader(self, schema) -> "ZstReader":
        return ZstReader(self.options)


class ZstReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        path = options.get("path")
        if not path:
            raise ValueError("zstfile source requires a path glob")
        self._path = path

    def partitions(self) -> list[InputPartition]:
        files = sorted(_glob.glob(self._path))
        if not files:
            raise FileNotFoundError(f"no files match {self._path!r}")
        return [InputPartition(p) for p in files]

    def read(self, partition: InputPartition):
        # Executor-side import keeps sources/ -> operators/ acyclic.
        from ..operators.multimodal13 import decode_zstd_frames

        p = partition.value
        with open(p, "rb") as fh:
            payload = fh.read()
        meta = decode_zstd_frames(payload)
        base = os.path.basename(p)
        content = meta["content"]
        pos = 0
        for idx, fr in enumerate(meta["frames"]):
            body = content[pos : pos + fr["content_len"]]
            pos += fr["content_len"]
            yield (
                base,
                idx,
                body,
                fr["content_len"],
                sum(body),
                fr["n_blocks"],
                fr["n_sequences"],
                fr["n_literals"],
                fr["huf_tlog"],
                fr["window_log"],
            )


def read_zst_source(spark, path_glob: str):
    """Register (idempotent) and read the zstfile source."""
    spark.dataSource.register(ZstDataSource)
    return spark.read.format("zstfile").load(path_glob)
