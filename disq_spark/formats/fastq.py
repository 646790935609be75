"""FASTQ record format: parse / format / record-start detection.

FASTQ is 4 lines per record (@name[ comment] / sequence / +[name] /
quality, len(quality) == len(sequence)). It is NOT line-splittable the
way SAM/VCF are: a byte split landing on a line boundary can still fall
mid-record, and '@' alone cannot identify a record start because quality
strings may begin with '@' (quality alphabet is '!'..'~'). The classic
disambiguation — the same chain-validation idea as the BAM record
guesser (BamRecordGuesser.java:42, applied to text) — is to accept an
'@' line only if a run of consecutive structurally-valid records follows
it.

This is a beyond-reference format (disq reads BAM/CRAM/SAM/VCF only);
FASTQ is what aligner input pipelines start from.
"""

from __future__ import annotations

#: IUPAC nucleotide codes + gap/padding chars, upper and lower case.
_SEQ_BYTES = frozenset(b"ACGTUNRYKMSWBDHVacgtunrykmswbdhv.-=*")

#: consecutive records an '@' line must head to count as a record start.
RECORDS_TO_CHECK = 2


def _valid_record_at(lines: list[bytes], i: int, at_eof: bool) -> bool:
    """lines[i:i+4] form one structurally valid FASTQ record.

    ``at_eof``: the line list ends the file (a truncated tail is invalid
    there; mid-buffer truncation is treated as unknown-but-plausible by
    the caller instead).
    """
    if i >= len(lines):
        return False
    l0 = lines[i]
    if not l0.startswith(b"@") or len(l0) < 2:
        return False
    if i + 3 >= len(lines):
        return not at_eof  # ran off the window: cannot refute
    l1, l2, l3 = lines[i + 1], lines[i + 2], lines[i + 3]
    if not l1 or any(b not in _SEQ_BYTES for b in l1):
        return False
    if not l2.startswith(b"+"):
        return False
    if len(l3) != len(l1):
        return False
    if any(b < 0x21 or b > 0x7E for b in l3):
        return False
    return True


def check_record_start(data: bytes, off: int, at_eof: bool = False) -> bool:
    """True if ``off`` (a line start) begins a chain of
    RECORDS_TO_CHECK structurally valid records (or valid records up to
    the end of ``data`` when ``at_eof``)."""
    window = data[off:]
    lines = window.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    for r in range(RECORDS_TO_CHECK):
        i = 4 * r
        if i >= len(lines):
            return at_eof  # fewer records than the chain: fine at EOF
        if not _valid_record_at(lines, i, at_eof):
            return False
    return True


def find_record_start(
    data: bytes, at_eof: bool = False, bol: bool = False
) -> int | None:
    """First offset in ``data`` that starts a FASTQ record (chain-
    validated). Candidates are LINE starts whose first byte is '@':
    offset 0 is a candidate only when ``bol`` asserts the window begins
    at a line boundary (file offset 0); otherwise scanning starts after
    the first newline. Without this, an '@' mid-name-line whose suffix
    happens to parse as a valid chain (e.g. name ``00@0`` before
    ``\\nA\\n+\\n0``) is accepted and a split snap lands mid-record —
    found by hypothesis, tests/test_properties.py."""
    pos = 0
    n = len(data)
    if not bol:
        nl = data.find(b"\n")
        if nl == -1:
            return None
        pos = nl + 1
    while pos < n:
        if data[pos : pos + 1] == b"@" and check_record_start(data, pos, at_eof):
            return pos
        nl = data.find(b"\n", pos)
        if nl == -1:
            return None
        pos = nl + 1
    return None


def parse_lines(lines: list[str]) -> dict[str, list]:
    """4-line groups -> column lists (name, comment, seq, qual)."""
    if len(lines) % 4 != 0:
        raise ValueError(f"FASTQ fragment has {len(lines)} lines (not a multiple of 4)")
    names: list = []
    comments: list = []
    seqs: list = []
    quals: list = []
    for i in range(0, len(lines), 4):
        l0 = lines[i]
        if not l0.startswith("@"):
            raise ValueError(f"bad FASTQ header line: {l0[:50]!r}")
        head = l0[1:]
        sp = head.find(" ")
        if sp == -1:
            names.append(head)
            comments.append(None)
        else:
            names.append(head[:sp])
            comments.append(head[sp + 1 :])
        seq = lines[i + 1]
        qual = lines[i + 3]
        if len(seq) != len(qual):
            raise ValueError(f"seq/qual length mismatch for {head[:50]!r}")
        seqs.append(seq)
        quals.append(qual)
    return {"name": names, "comment": comments, "seq": seqs, "qual": quals}


def format_record(name: str, comment: str | None, seq: str, qual: str) -> str:
    """Columns -> 4-line FASTQ text (no trailing newline)."""
    head = f"@{name} {comment}" if comment else f"@{name}"
    return f"{head}\n{seq}\n+\n{qual}"
