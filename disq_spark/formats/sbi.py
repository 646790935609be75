"""SBI (BAM splitting index) read / write / merge.

Format (htsjdk SBIIndex, verified against the reference fixture
``1-with-splitting-index.bam.sbi``): little-endian
  magic 'SBI\\x01', fileLength:i64, md5:16B, uuid:16B,
  totalNumberOfRecords:i64, granularity:i64, numOffsets:i64,
  then numOffsets x virtualOffset:i64 (ascending; the last offset is the
  virtual end-of-data position).

Distributed build-and-merge parity (SURVEY.md §2.4): each part writes its
own index fragment during encode; the merger shifts every virtual offset
by the cumulative compressed length of preceding parts
(SbiMerger.java:39-64 + htsjdk SBIIndexMerger semantics).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from disq_spark import fs

MAGIC = b"SBI\x01"


@dataclass
class SbiIndex:
    file_length: int
    total_records: int
    granularity: int
    offsets: list[int]  # virtual offsets, ascending; last = end of data

    def chunk(self, byte_start: int, byte_end: int) -> tuple[int, int] | None:
        """First record-start virtual offset within compressed byte range
        [byte_start, byte_end) -> (vStart, vEnd) or None (the
        SBIIndex.getChunk(start, end) operation, BamSource.java:99-119)."""
        lo = byte_start << 16
        hi = byte_end << 16
        starts = self.offsets[:-1]
        # binary search for first offset >= lo
        import bisect

        i = bisect.bisect_left(starts, lo)
        if i >= len(starts) or starts[i] >= hi:
            return None
        j = bisect.bisect_left(starts, hi)
        v_end = self.offsets[j] if j < len(self.offsets) else self.offsets[-1]
        return starts[i], v_end


def read_sbi(path: str) -> SbiIndex:
    with fs.open_input(path) as f:
        data = f.read()
    if data[:4] != MAGIC:
        raise ValueError("not an SBI index")
    file_length, = struct.unpack_from("<q", data, 4)
    nrec, gran, noff = struct.unpack_from("<qqq", data, 44)
    offsets = list(struct.unpack_from(f"<{noff}q", data, 68))
    return SbiIndex(file_length, nrec, gran, offsets)


def write_sbi(path: str, index: SbiIndex) -> None:
    with fs.open_output(path) as f:
        f.write(MAGIC)
        f.write(struct.pack("<q", index.file_length))
        f.write(b"\x00" * 32)  # md5 + uuid (optional integrity fields)
        f.write(struct.pack("<qqq", index.total_records, index.granularity, len(index.offsets)))
        f.write(struct.pack(f"<{len(index.offsets)}q", *index.offsets))


def write_sbi_stream(
    path: str,
    file_length: int,
    total_records: int,
    granularity: int,
    num_offsets: int,
    blob_paths: list[str],
    tail_offset: int,
    buf_size: int = 8 * 1024 * 1024,
) -> None:
    """Write an .sbi by STREAMING pre-packed little-endian int64 offset
    blobs from fragment files, never materializing the offset array.

    This is the driver-memory-bounded path for index construction over
    very large inputs (10^12 records at granularity 1 would be ~8 TB of
    offsets — nothing any single heap should hold): tasks write their
    packed offsets as fragment files, the driver concatenates them here
    in chunk order and appends the end-of-data sentinel. Driver peak
    memory is O(buf_size), independent of record count.
    """
    with fs.open_output(path) as f:
        f.write(MAGIC)
        f.write(struct.pack("<q", file_length))
        f.write(b"\x00" * 32)  # md5 + uuid (optional integrity fields)
        f.write(struct.pack("<qqq", total_records, granularity, num_offsets))
        for bp in blob_paths:
            with fs.open_input(bp) as src:
                while True:
                    chunk = src.read(buf_size)
                    if not chunk:
                        break
                    f.write(chunk)
        f.write(struct.pack("<q", tail_offset))


def merge_sbi(
    parts: list[SbiIndex],
    part_lengths: list[int],
    final_voff: int,
    base_offset: int = 0,
) -> SbiIndex:
    """Merge per-part indexes for a concatenation of those parts.

    ``part_lengths[i]`` is the compressed byte length of part i as laid
    out in the final file (header part included in the shift base).
    Virtual offsets shift by (cumulative_bytes << 16); intra-block
    offsets are preserved (IndexFileMerger.java:48-105 semantics).
    """
    offsets: list[int] = []
    shift_bytes = base_offset  # e.g. the concatenated header's length
    total = 0
    for idx, plen in zip(parts, part_lengths):
        for vo in idx.offsets[:-1]:  # drop each part's end-sentinel
            offsets.append(((vo >> 16) + shift_bytes) << 16 | (vo & 0xFFFF))
        total += idx.total_records
        shift_bytes += plen
    offsets.append(final_voff)
    return SbiIndex(file_length=0, total_records=total, granularity=parts[0].granularity if parts else 1, offsets=offsets)
