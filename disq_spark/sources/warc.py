"""Distributed WARC / WARC.GZ reader — the Common Crawl ingestion path.

``read_warc`` plans byte-range chunks over the file (driver-side, like
the BAM/VCF planners) and each task snaps its range start to the next
record boundary: gzip-member magic + inflate-validate for ``.warc.gz``
(members are per-record, so the file is block-splittable), header-parse
validation for plain ``.warc``. A record belongs to the chunk its first
byte falls in — every record is read exactly once for any split size,
the same contract the genomics sources test with split matrices.

Scale shape: planning is O(#chunks) on the driver; each task reads only
its byte range (+ a bounded overscan for the record spanning its end),
so a 100 TB crawl fans out to size/split_size independent tasks with no
shuffle before the first transformation.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from disq_spark.formats.warc import (
    find_record_start,
    iter_gzip_members,
    parse_record,
    parse_records,
)

WARC_SCHEMA = (
    "record_id string, warc_type string, url string, date string, "
    "mime string, content_length long, payload binary"
)

_OVERSCAN = 1 << 26  # plain-warc: max record size a chunk may complete


def _rows_of(headers: dict, payload: bytes):
    return (
        headers.get("WARC-Record-ID"),
        headers.get("WARC-Type"),
        headers.get("WARC-Target-URI"),
        headers.get("WARC-Date"),
        headers.get("Content-Type"),
        len(payload),
        payload,
    )


def read_warc(
    spark: SparkSession, path: str, split_size: int = 64 * 1024 * 1024
) -> DataFrame:
    size = os.path.getsize(path)
    is_gz = path.endswith(".gz")
    chunks = [
        (path, s, min(s + split_size, size), is_gz)
        for s in range(0, max(size, 1), split_size)
    ]
    cdf = spark.createDataFrame(
        chunks, "path string, start long, end long, is_gz boolean"
    ).repartition(len(chunks))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "record_id", "warc_type", "url", "date", "mime",
            "content_length", "payload",
        ]
        for pdf in batches:
            for p, start, end, gz in zip(
                pdf["path"], pdf["start"], pdf["end"], pdf["is_gz"]
            ):
                rows = []
                if gz:
                    from disq_spark.formats.warc import find_gzip_member_start

                    s = 0 if start == 0 else find_gzip_member_start(p, int(start))
                    if s < 0 or s >= end:
                        yield pd.DataFrame(columns=cols)
                        continue
                    for _off, data in iter_gzip_members(p, s, int(end)):
                        for headers, payload in parse_records(data):
                            rows.append(_rows_of(headers, payload))
                else:
                    with open(p, "rb") as f:
                        f.seek(int(start))
                        buf = f.read(int(end - start) + _OVERSCAN)
                        s = 0 if start == 0 else find_record_start(buf, 0)
                        if s < 0 or start + s >= end:
                            yield pd.DataFrame(columns=cols)
                            continue
                        pos = s
                        limit = int(end - start)
                        while pos < limit:
                            rec = parse_record(buf, pos)
                            # the record that STARTS in-range may span
                            # past the overscan: extend until complete
                            while rec is None:
                                more = f.read(_OVERSCAN)
                                if not more:
                                    break
                                buf += more
                                rec = parse_record(buf, pos)
                            if rec is None:
                                break
                            headers, payload, nxt = rec
                            rows.append(_rows_of(headers, payload))
                            pos = nxt
                yield pd.DataFrame(rows, columns=cols)

    return cdf.mapInPandas(kernel, WARC_SCHEMA)
