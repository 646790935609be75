"""SAM sink: single-file text (SamSink.java:53-74 pattern) and sharded.

Single-file: headerless text parts in parallel -> header file -> concat.
(SAM needs no terminator.)
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from disq_spark.formats.sam import format_sam_batch
from disq_spark.headers import SamHeader
from disq_spark.sinks import merge


def write_sam(
    df: DataFrame, header: SamHeader, path: str, single_file: bool | None = None
) -> None:
    if single_file is None:
        single_file = path.endswith(".sam")
    merge.prepare_overwrite(path)
    if single_file:
        _write_single(df, header, path)
    else:
        _write_sharded(df, header, path)


def _write_single(df: DataFrame, header: SamHeader, path: str) -> None:
    parts_dir = path + ".parts"
    os.makedirs(parts_dir, exist_ok=True)

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        part_path = os.path.join(parts_dir, f"part-{pid:05d}")
        tmp = part_path + ".tmp"
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for line in format_sam_batch(pdf):
                    f.write(line)
                    f.write("\n")
                n += len(pdf)
        if n > 0:
            os.replace(tmp, part_path)
        else:
            os.remove(tmp)
        yield pd.DataFrame({"part": [part_path], "n": [n]})

    df.mapInPandas(write_partition, "part string, n long").collect()

    header_path = os.path.join(parts_dir, "_header")
    with open(header_path, "w", encoding="utf-8") as f:
        f.write(header.text)
    merge.concat_parts(path, [header_path] + merge.list_parts(parts_dir))
    merge.cleanup(parts_dir)


def _write_sharded(df: DataFrame, header: SamHeader, path: str) -> None:
    os.makedirs(path, exist_ok=True)
    header_text = header.text

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        part_path = os.path.join(path, f"part-{pid:05d}.sam")
        n = 0
        with open(part_path, "w", encoding="utf-8") as f:
            f.write(header_text)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for line in format_sam_batch(pdf):
                    f.write(line)
                    f.write("\n")
                n += len(pdf)
        yield pd.DataFrame({"part": [part_path], "n": [n]})

    df.mapInPandas(write_partition, "part string, n long").collect()
