"""Property-based round-trip tests (hypothesis) for the byte-level
codecs — the layer where a single off-by-one corrupts a 100 TB dataset.
No Spark session needed; these run in milliseconds per case.
"""

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from disq_spark.formats import bgzf
from disq_spark.formats.bam import _f32_str, decode_record, encode_record
from disq_spark.formats.cram_encode import write_itf8, write_ltf8
from disq_spark.formats.cram import read_itf8, read_ltf8
from disq_spark.formats.sam import format_sam_line, parse_sam_lines
from disq_spark.schemas import READS_COLUMNS

# --------------------------------------------------------------------------
# ITF8 / LTF8 varints
# --------------------------------------------------------------------------
@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_itf8_roundtrip(v):
    data = write_itf8(v)
    got, n = read_itf8(data, 0)
    assert got == v and n == len(data)


@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_ltf8_roundtrip(v):
    data = write_ltf8(v)
    got, n = read_ltf8(data, 0)
    assert got == v and n == len(data)


# --------------------------------------------------------------------------
# BGZF: write -> scan -> decompress recovers the payload, any block size
# --------------------------------------------------------------------------
@settings(max_examples=25, deadline=None)
@given(st.binary(min_size=0, max_size=300_000))
def test_bgzf_roundtrip(payload):
    out = io.BytesIO()
    w = bgzf.BgzfWriter(out, terminate=True)
    w.write(payload)
    w.close()
    raw = out.getvalue()

    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".bgz") as f:
        f.write(raw)
        f.flush()
        assert bgzf.is_bgzf(f.name) or len(payload) == 0
        back = bgzf.read_range(f.name, 0, len(raw))
    assert back == payload


# --------------------------------------------------------------------------
# BAM record codec: arbitrary reads-schema rows survive encode -> decode
# --------------------------------------------------------------------------
# '*' is the SAM "missing name" sentinel: it round-trips to NULL by
# design, so the generator avoids it ('@' would collide with headers)
_name = st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E, exclude_characters="@*"),
    min_size=1,
    max_size=20,
)
_seq = st.text(alphabet="ACGTN", min_size=1, max_size=60)


@st.composite
def read_rows(draw):
    seq = draw(_seq)
    n = len(seq)
    mapped = draw(st.booleans())
    cigar = f"{n}M" if mapped else None
    start = draw(st.integers(min_value=1, max_value=10_000)) if mapped else None
    qual = "".join(chr(draw(st.integers(min_value=33, max_value=93 + 33)) ) for _ in range(n))
    if qual == "*":  # length-1 '*' collides with SAM's missing-qual sentinel
        qual = "+"
    flags = draw(st.integers(min_value=0, max_value=0xFFF))
    flags = (flags | 0x4) if not mapped else (flags & ~0x4)
    tags = draw(
        st.dictionaries(
            st.text(alphabet="ABXYZ", min_size=2, max_size=2),
            st.one_of(
                st.integers(min_value=-1000, max_value=1000).map(lambda v: f"i:{v}"),
                st.text(alphabet="abc123", max_size=8).map(lambda s: f"Z:{s}"),
                # float tags canonicalized to the shortest float32 repr the
                # decoder emits, so equality tests the full 32-bit value
                # ('%g' used to truncate at 6 significant digits)
                st.floats(width=32, allow_nan=False, allow_infinity=False).map(
                    lambda v: f"f:{_f32_str(v)}"
                ),
                st.lists(
                    st.floats(width=32, allow_nan=False, allow_infinity=False),
                    min_size=1,
                    max_size=4,
                ).map(lambda vs: "B:f," + ",".join(_f32_str(v) for v in vs)),
            ),
            max_size=3,
        )
    )
    return {
        "name": draw(_name),
        "flags": flags,
        "contig": "c1" if mapped else None,
        "start": start,
        "end": (start + n - 1) if mapped else None,
        "mapq": draw(st.integers(min_value=0, max_value=254)),
        "cigar": cigar,
        "mate_contig": None,
        "mate_start": None,
        "template_len": draw(st.integers(min_value=-5000, max_value=5000)),
        "seq": seq,
        "qual": qual,
        "tags": tags or None,
        "read_group": None,
    }


@settings(max_examples=200, deadline=None)
@given(read_rows())
def test_bam_record_roundtrip(row):
    refs = [("c1", 100_000)]
    ref_index = {"c1": 0}
    blob = encode_record(row, ref_index)
    got, nxt = decode_record(blob, 0, refs)
    assert nxt == len(blob)
    d = dict(zip(READS_COLUMNS, got))
    for k in ("name", "flags", "contig", "start", "end", "mapq", "cigar", "seq", "qual"):
        assert d[k] == row[k], k
    assert (d["tags"] or {}) == (row["tags"] or {})


# --------------------------------------------------------------------------
# SAM line codec round-trip
# --------------------------------------------------------------------------
@settings(max_examples=100, deadline=None)
@given(read_rows())
def test_sam_line_roundtrip(row):
    import pandas as pd

    line = format_sam_line(row)
    back = parse_sam_lines(pd.Series([line]))
    assert len(back) == 1
    d = back.iloc[0]
    for k in ("name", "flags", "contig", "start", "end", "cigar", "seq", "qual"):
        got = d[k]
        if got is None or (isinstance(got, float) and pd.isna(got)):
            assert row[k] is None, k
        else:
            assert got == row[k], k


# --------------------------------------------------------------------------
# CRAM container codec: random mapped reads (substitutions + clips)
# survive encode_container -> decode round-trip
# --------------------------------------------------------------------------
@st.composite
def cram_reads(draw):
    import random as _r

    rng = _r.Random(draw(st.integers(min_value=0, max_value=2**31)))
    ref = "".join(rng.choice("ACGT") for _ in range(800))
    rows = []
    n = draw(st.integers(min_value=1, max_value=12))
    pos_cursor = 1
    for i in range(n):
        pos = min(pos_cursor + rng.randint(0, 40), 700)
        pos_cursor = pos
        rl = rng.randint(20, 60)
        clip = rng.randint(0, 5)
        body = list(ref[pos - 1 : pos - 1 + rl - clip])
        for _ in range(rng.randint(0, 3)):  # substitutions
            j = rng.randrange(len(body))
            body[j] = rng.choice([b for b in "ACGT" if b != body[j]])
        seq = "".join(rng.choice("ACGT") for _ in range(clip)) + "".join(body)
        cigar = (f"{clip}S" if clip else "") + f"{rl - clip}M"
        qual = "".join(chr(33 + rng.randint(0, 60)) for _ in range(rl))
        rows.append(
            (
                f"r{i}", 0, "c1", pos, pos + (rl - clip) - 1, 30, cigar,
                None, None, 0, seq, qual, {"XT": f"Z:v{i}"}, None,
            )
        )
    return ref, rows


@settings(max_examples=40, deadline=None)
@given(cram_reads())
def test_cram_container_roundtrip(case):
    from disq_spark.formats import cram_encode as CE
    from disq_spark.formats.cram_decode import (
        COMPRESSION_HEADER,
        decode_containers,
    )
    from disq_spark.formats.cram import parse_container_header

    ref, rows = case
    refs = [("c1", len(ref))]

    def get_ref(contig, s1, e1):
        return ref[s1 - 1 : e1]

    container, _crai = CE.encode_container(rows, {"c1": 0}, get_ref)
    c = parse_container_header(container, 0, major=3)
    got = list(decode_containers(container, [c], 3, refs, get_ref))
    assert len(got) == len(rows)
    for want, have in zip(rows, sorted(got, key=lambda r: int(r[0][1:]))):
        w = dict(zip(READS_COLUMNS, want))
        h = dict(zip(READS_COLUMNS, have))
        for k in ("name", "flags", "contig", "start", "end", "cigar", "seq", "qual"):
            assert h[k] == w[k], (k, w[k], h[k])
        assert h["tags"] == w["tags"]


# --------------------------------------------------------------------------
# BAI distributed-merge algebra: splitting a record stream into parts at
# ANY boundaries and merging the per-part indexes (through the fragment
# file encoding) equals the serial single-pass index
# --------------------------------------------------------------------------
@st.composite
def indexed_records(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    recs = []
    pos = 0
    for _ in range(n):
        pos += draw(st.integers(min_value=0, max_value=40_000))
        length = draw(st.integers(min_value=1, max_value=300))
        recs.append((0, pos, pos + length))  # (ref_id, pos0, end0)
    cuts = sorted(draw(st.sets(st.integers(min_value=1, max_value=max(n - 1, 1)), max_size=4)))
    return recs, [c for c in cuts if c < n]


@settings(max_examples=60, deadline=None)
@given(indexed_records())
def test_bai_merge_equals_serial(case):
    import tempfile
    from pathlib import Path

    from disq_spark.formats import bai as baimod
    from disq_spark.formats.bam import _reg2bin

    recs, cuts = case
    REC = 100  # synthetic compressed bytes per record

    serial = baimod.BaiBuilder(1)
    for j, (rid, p0, e0) in enumerate(recs):
        serial.add(rid, p0, e0, _reg2bin(p0, e0), (j * REC) << 16, ((j + 1) * REC) << 16, True)
    serial_idx = serial.build()

    bounds = [0] + cuts + [len(recs)]
    tmp = Path(tempfile.mkdtemp())
    parts, lengths = [], []
    for pi in range(len(bounds) - 1):
        a, b = bounds[pi], bounds[pi + 1]
        builder = baimod.BaiBuilder(1)
        for j in range(a, b):
            rid, p0, e0 = recs[j]
            builder.add(
                rid, p0, e0, _reg2bin(p0, e0),
                ((j - a) * REC) << 16, ((j - a + 1) * REC) << 16, True,
            )
        frag = str(tmp / f"part{pi}.bai")
        baimod.write_bai(frag, builder.build(), fragment=True)
        parts.append(baimod.read_bai(frag, fragment=True))
        lengths.append((b - a) * REC)
    merged = baimod.merge_bai(parts, lengths, base_offset=0)

    ms, ss = merged.refs[0], serial_idx.refs[0]
    assert ms.bins == ss.bins
    assert [max(v, 0) for v in ms.linear] == [max(v, 0) for v in ss.linear]
    assert (ms.n_mapped, ms.n_unmapped) == (ss.n_mapped, ss.n_unmapped)
    assert ms.ref_beg == ss.ref_beg and ms.ref_end == ss.ref_end


# ---------------------------------------------------------------------------
# FASTQ record-start guesser (formats/fastq.py)
# ---------------------------------------------------------------------------

_name_st = st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E, exclude_characters=" "),
    min_size=1,
    max_size=12,
)
_seq_st = st.text(alphabet="ACGTN", min_size=1, max_size=60)


@st.composite
def _fastq_records(draw):
    n = draw(st.integers(min_value=2, max_value=8))
    recs = []
    for _ in range(n):
        name = draw(_name_st)
        seq = draw(_seq_st)
        # quality free over '!'..'~' — includes '@'-led ambiguity cases
        qual = draw(
            st.text(
                alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E),
                min_size=len(seq),
                max_size=len(seq),
            )
        )
        recs.append(f"@{name}\n{seq}\n+\n{qual}")
    return "\n".join(recs) + "\n"


@settings(max_examples=60, deadline=None)
@given(_fastq_records(), st.integers(min_value=0, max_value=400))
def test_fastq_guesser_lands_on_true_record_start(text, cut):
    """From ANY byte offset, find_record_start returns a true record
    boundary (an offset in the set of real record starts) — never a
    quality line, never mid-record. May skip forward past ambiguous
    prefixes, but what it picks must be genuine."""
    from disq_spark.formats import fastq as fq

    data = text.encode()
    # ground truth: offsets where each record begins
    true_starts = []
    off = 0
    for i, line in enumerate(data.split(b"\n")[:-1]):
        if i % 4 == 0:
            true_starts.append(off)
        off += len(line) + 1
    cut = min(cut, len(data) - 1)
    # model the _snap caller contract: a cut inside the file reads from
    # cut-1 so line-start candidacy is provable; cut 0 is a line start
    base = max(cut - 1, 0)
    window = data[base:]
    found = fq.find_record_start(window, at_eof=True, bol=(cut == 0))
    if found is not None:
        s = base + found
        assert s in true_starts, (cut, s, text[:120])
        assert s >= cut, (cut, s, text[:120])
    else:
        # None is acceptable only if no true start lies at/after the cut
        assert all(s < cut for s in true_starts), (cut, text[:120])


# --------------------------------------------------------------------------
# rANS 4x8 order-0: compress -> uncompress identity for any byte string
# (uniform, skewed, tiny, single-symbol — the encoder's frequency
# normalization and table RLE must hold everywhere)
# --------------------------------------------------------------------------
@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=50_000))
def test_rans_compress_roundtrip_property(data):
    from disq_spark.formats import rans

    assert rans.uncompress(rans.compress(data)) == data


@settings(max_examples=25, deadline=None)
@given(
    st.binary(min_size=1, max_size=8),  # tiny alphabet -> heavy skew
    st.integers(min_value=1, max_value=20_000),
)
def test_rans_skewed_alphabet_roundtrip(alphabet, n):
    import random

    from disq_spark.formats import rans

    rng = random.Random(n)
    data = bytes(alphabet[rng.randrange(len(alphabet))] for _ in range(n))
    assert rans.uncompress(rans.compress(data)) == data


# order-1: contexts are per-quarter predecessor chains with a len%4 tail on
# state 3 — tiny inputs (q=0), single-context, and Markov-ish data must all
# survive encode -> decode
@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=50_000))
def test_rans_o1_compress_roundtrip_property(data):
    from disq_spark.formats import rans

    assert rans.uncompress(rans.compress_o1(data)) == data


@settings(max_examples=25, deadline=None)
@given(
    st.binary(min_size=1, max_size=6),
    st.integers(min_value=1, max_value=20_000),
)
def test_rans_o1_markov_roundtrip(alphabet, n):
    """Context-correlated data (each byte biased toward repeating its
    predecessor — the quality-string shape order-1 models)."""
    import random

    from disq_spark.formats import rans

    rng = random.Random(n)
    out = bytearray([alphabet[0]])
    for _ in range(n - 1):
        out.append(out[-1] if rng.random() < 0.8 else alphabet[rng.randrange(len(alphabet))])
    data = bytes(out)
    enc = rans.compress_o1(data)
    assert rans.uncompress(enc) == data


# --------------------------------------------------------------------------
# PNG: encode (any per-row filter mix) -> decode is pixel-exact
# --------------------------------------------------------------------------
@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=6),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(w, h, filters, seed):
    import numpy as np

    from disq_spark.operators.multimodal import _decode_png, encode_png

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    got_w, got_h, back = _decode_png(encode_png(img, filters))
    assert (got_w, got_h) == (w, h)
    assert np.array_equal(back, img)


# --------------------------------------------------------------------------
# JPEG (formats/jpeg.py): lossy round-trip with bounded error on any
# content; bit-exact on the blockwise-constant grayscale subspace (the
# contract the multimodal_jpeg_decode oracle gate relies on).
# --------------------------------------------------------------------------
@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=8, max_value=40),
    st.integers(min_value=8, max_value=40),
    st.booleans(),
    st.sampled_from([0, 2, 5]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_roundtrip_bounded_error_property(w, h, subsample, rst, seed):
    # min dim 8: below one block, edge-replication padding makes the
    # per-pixel gradient a max-frequency edge and the q90 error is
    # legitimately large — not the regime this bound is about
    import numpy as np

    from disq_spark.formats.jpeg import decode_jpeg, encode_jpeg

    # smooth content (gradient + low-freq sine): JPEG's design target,
    # where quality-90 error stays within a few counts
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    rng = np.random.default_rng(seed)
    ph = rng.uniform(0, np.pi, 3)
    img = np.stack(
        [
            128 + 100 * np.sin(xx / 13 + ph[0]) * np.cos(yy / 11 + ph[1]),
            np.minimum(255, 255 * xx / max(w, 1)),
            np.minimum(255, 255 * yy / max(h, 1)),
        ],
        axis=2,
    ).clip(0, 255).astype(np.uint8)
    got = decode_jpeg(
        encode_jpeg(img, quality=90, subsample=subsample, restart_interval=rst)
    )
    assert got is not None
    gw, gh, back = got
    assert (gw, gh) == (w, h)
    err = np.abs(back.astype(int) - img.astype(int))
    # 4:4:4 q90 stays within ~16 counts on smooth content; 4:2:0 adds
    # chroma-pooling error, worst on small steep-gradient images
    assert err.mean() < (12.0 if subsample else 8.0)
    assert err.max() <= (64 if subsample else 32)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
    st.sampled_from([0, 1, 3]),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_blockconstant_gray_exact_property(bw, bh, rst, seed):
    import numpy as np

    from disq_spark.formats.jpeg import decode_jpeg, encode_jpeg

    vals = np.random.default_rng(seed).integers(0, 256, (bh, bw), dtype=np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    gw, gh, back = decode_jpeg(
        encode_jpeg(img, quality=100, restart_interval=rst)
    )
    assert (gw, gh) == (bw * 8, bh * 8)
    assert np.array_equal(back, np.repeat(img[:, :, None], 3, axis=2))


def test_jpeg_matches_png_path_on_synthetic_images():
    """The JPEG decode path must agree with the (lossless) PNG path on
    the same synthetic image up to the documented quality-100 error
    bound — ties the new decoder to the already-trusted one."""
    import numpy as np

    from disq_spark.formats.jpeg import decode_jpeg, encode_jpeg
    from disq_spark.operators.multimodal import (
        _decode_png,
        _image_features,
        encode_png,
    )

    rng = np.random.default_rng(20260815)
    for trial in range(5):
        img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
        _, _, via_png = _decode_png(encode_png(img))
        got = decode_jpeg(encode_jpeg(img, quality=100))
        assert got is not None
        _, _, via_jpeg = got
        assert np.array_equal(via_png, img)
        err = np.abs(via_jpeg.astype(int) - via_png.astype(int))
        assert err.max() <= 4  # q100: rounding error only
        fp = _image_features(via_png)
        fj = _image_features(via_jpeg)
        assert all(abs(a - b) < 0.01 for a, b in zip(fp, fj))


def test_jpeg_decoder_rejects_malformed():
    import numpy as np

    from disq_spark.formats.jpeg import decode_jpeg, encode_jpeg

    img = np.random.default_rng(3).integers(0, 256, (16, 16, 3), dtype=np.uint8)
    enc = encode_jpeg(img)
    assert decode_jpeg(b"") is None
    assert decode_jpeg(b"\xff\xd8\xff") is None
    assert decode_jpeg(b"not a jpeg at all") is None
    assert decode_jpeg(enc[:40]) is None          # truncated headers
    assert decode_jpeg(enc[: len(enc) // 2]) is None  # truncated entropy data
    # progressive SOF2 marker -> refused, not crashed
    prog = enc.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg(prog) is None


# ---------------------------------------------------------------------------
# GIF codec properties (formats/gif.py)
# ---------------------------------------------------------------------------
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    colors=st.integers(1, 256),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=30, deadline=None)
def test_gif_roundtrip_lossless_property(w, h, colors, seed):
    """GIF is lossless on <=256-color content: encode->decode must be
    pixel-exact for any palette size (exercises LZW width growth and,
    on larger images, mid-stream dictionary resets)."""
    import numpy as np

    from disq_spark.formats.gif import decode_gif, encode_gif

    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (colors, 3), dtype=np.uint8)
    img = pal[rng.integers(0, colors, (h, w))]
    gw, gh, back = decode_gif(encode_gif(img))
    assert (gw, gh) == (w, h)
    assert np.array_equal(back, img)


def test_gif_known_fixture_and_interlace():
    """Decoder pinned by the widely-published 1x1 black-pixel GIF89a
    byte vector, and by a hand-built interlaced variant of our own
    encoder output (rows permuted into interlace pass order + the
    interlace flag set) that must decode back to the original image."""
    import struct

    import numpy as np

    from disq_spark.formats.gif import (
        _INTERLACE_PASSES,
        _lzw_encode,
        decode_gif,
        encode_gif,
    )

    onepx = bytes(
        [0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 0x01, 0x00, 0x01, 0x00, 0x80, 0x00,
         0x00, 0x00, 0x00, 0x00, 0xFF, 0xFF, 0xFF, 0x21, 0xF9, 0x04, 0x01, 0x00,
         0x00, 0x00, 0x00, 0x2C, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00,
         0x00, 0x02, 0x02, 0x44, 0x01, 0x00, 0x3B]
    )
    w, h, img = decode_gif(onepx)
    assert (w, h) == (1, 1) and img.tolist() == [[[0, 0, 0]]]

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (13, 9), dtype=np.uint8)
    hh, ww = idx.shape
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, hh, step)]
    data = _lzw_encode(idx[order].tobytes(), 4)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", ww, hh, 0x80 | 3, 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, ww, hh, 0x40)  # interlaced
    out.append(4)
    for i in range(0, len(data), 255):
        out.append(len(data[i : i + 255]))
        out += data[i : i + 255]
    out += b"\x00\x3b"
    gw, gh, back = decode_gif(bytes(out))
    assert (gw, gh) == (ww, hh)
    assert np.array_equal(back, pal[idx])


def test_gif_matches_png_path_and_rejects_malformed():
    import numpy as np

    from disq_spark.formats.gif import decode_gif, encode_gif
    from disq_spark.operators.multimodal import _decode_png, encode_png, try_decode_image

    rng = np.random.default_rng(20260818)
    pal = rng.integers(0, 256, (64, 3), dtype=np.uint8)
    img = pal[rng.integers(0, 64, (21, 34))]
    _, _, via_png = _decode_png(encode_png(img))
    _, _, via_gif = decode_gif(encode_gif(img))
    assert np.array_equal(via_png, via_gif)
    # dispatch: try_decode_image routes GIF payloads
    w, h, routed = try_decode_image(encode_gif(img))
    assert (w, h) == (34, 21) and np.array_equal(routed, img)
    # >256 colors is a codec error, not a silent quantize
    import pytest as _pytest

    i = np.arange(32 * 32)  # 1024 distinct colors
    grad = np.stack([i % 256, (i // 256) * 61 % 256, i % 7], axis=1)
    with _pytest.raises(ValueError):
        encode_gif(grad.reshape(32, 32, 3).astype(np.uint8))
    assert decode_gif(b"") is None
    assert decode_gif(b"GIF8") is None
    assert decode_gif(b"not a gif") is None
    enc = encode_gif(img)
    with _pytest.raises(ValueError):
        decode_gif(enc[: len(enc) // 2])  # truncated stream


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2) properties
# ---------------------------------------------------------------------------
@given(
    w=st.integers(1, 48),
    h=st.integers(1, 48),
    quality=st.sampled_from([20, 50, 90, 100]),
    subsample=st.booleans(),
    rst=st.sampled_from([0, 0, 2, 5]),
    smooth=st.booleans(),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=25, deadline=None)
def test_progressive_jpeg_equals_baseline_property(w, h, quality, subsample, rst, smooth, seed):
    """Progressive encoding carries the IDENTICAL quantized DCT
    coefficients as baseline (spectral selection + successive
    approximation merely reorder the bits), so progressive decode must
    equal baseline decode pixel-exactly — for any size, quality, 4:2:0
    layout, and restart interval. `smooth` drives long EOB runs (the
    multi-block EOBRUN skip/correction paths); random images drive
    dense coefficients (ZRL-in-refine, newly-nonzero insertion)."""
    import numpy as np

    from disq_spark.formats.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(seed)
    if smooth:
        gy, gx = np.mgrid[0:h, 0:w]
        img = (
            np.stack([(gy * 3) % 256, (gx * 3) % 256, (gy + gx) % 256], axis=2)
        ).astype(np.uint8)
    else:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    kw = dict(quality=quality, subsample=subsample, restart_interval=rst)
    base = decode_jpeg(encode_jpeg(img, **kw))
    prog = decode_jpeg(encode_jpeg(img, progressive=True, **kw))
    assert prog is not None
    assert (base[0], base[1]) == (prog[0], prog[1])
    assert np.array_equal(base[2], prog[2])


def test_progressive_jpeg_gray_and_malformed():
    import numpy as np

    from disq_spark.formats.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (21, 30), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(g))
    prog_bytes = encode_jpeg(g, progressive=True)
    prog = decode_jpeg(prog_bytes)
    assert np.array_equal(base[2], prog[2])
    # truncated progressive stream -> None, not a crash
    assert decode_jpeg(prog_bytes[: len(prog_bytes) // 2]) is None
    # arithmetic-coded SOF9 still refused
    assert decode_jpeg(prog_bytes.replace(b"\xff\xc2", b"\xff\xc9", 1)) is None


def test_png_adam7_interlace_decode():
    """Adam7 decode must reproduce the original pixels for every color
    type, including edge sizes where some passes are empty (1x1, 3x5)
    and a mix of per-pass row filters."""
    import struct
    import zlib

    import numpy as np

    from disq_spark.operators.multimodal import _ADAM7, _decode_png

    def build_interlaced(px, ctype, channels, pal=None, filt_type=0):
        h, w = px.shape[:2]
        raw = bytearray()
        for x0, xs, y0, ys in _ADAM7:
            sub = px[y0::ys, x0::xs]
            if sub.size == 0:
                continue
            prev = np.zeros(sub.shape[1] * channels, np.int32)
            for row in sub.reshape(sub.shape[0], -1):
                r = row.astype(np.int32)
                if filt_type == 2:  # Up filter inside a pass
                    raw += bytes([2]) + bytes(((r - prev) % 256).astype(np.uint8))
                else:
                    raw += bytes([0]) + bytes(r.astype(np.uint8))
                prev = r
        def chunk(typ, data):
            c = struct.pack(">I", len(data)) + typ + data
            return c + struct.pack(">I", zlib.crc32(typ + data))
        out = b"\x89PNG\r\n\x1a\n"
        out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1))
        if pal is not None:
            out += chunk(b"PLTE", pal.tobytes())
        out += chunk(b"IDAT", zlib.compress(bytes(raw)))
        out += chunk(b"IEND", b"")
        return out

    rng = np.random.default_rng(20260819)
    for hw in ((1, 1), (3, 5), (8, 8), (13, 21), (16, 16)):
        for ft in (0, 2):
            # RGB
            img = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
            w, h, got = _decode_png(build_interlaced(img, 2, 3, filt_type=ft))
            assert (w, h) == (hw[1], hw[0]) and np.array_equal(got, img), (hw, ft)
            # grayscale
            g = rng.integers(0, 256, (*hw, 1), dtype=np.uint8)
            w, h, got = _decode_png(build_interlaced(g, 0, 1, filt_type=ft))
            assert np.array_equal(got, np.repeat(g, 3, axis=2)), (hw, ft)
        # palette
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (*hw, 1), dtype=np.uint8)
        w, h, got = _decode_png(build_interlaced(idx, 3, 1, pal=pal))
        assert np.array_equal(got, pal[idx[:, :, 0]]), hw


# ---------------------------------------------------------------------------
# FLAC codec properties (formats/flac.py)
# ---------------------------------------------------------------------------
@given(
    n=st.integers(1, 6000),
    stereo=st.booleans(),
    bps=st.sampled_from([8, 16, 16, 24]),
    smooth=st.booleans(),
    as_lpc=st.booleans(),
    block=st.sampled_from([4096, 192, 1000]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=25, deadline=None)
def test_flac_roundtrip_lossless_property(n, stereo, bps, smooth, as_lpc, block, seed):
    """FLAC is lossless: encode->decode must reproduce the PCM exactly
    for any length, bit depth, channel layout, block size, predictor
    family (FIXED or LPC-emitted), and signal shape (noise drives
    high Rice params / rice2; smooth drives low params and mid-side)."""
    import numpy as np

    from disq_spark.formats.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    hi = 1 << (bps - 1)
    shape = (n, 2) if stereo else (n,)
    if smooth:
        t = np.arange(n)
        base = (0.4 * hi * np.sin(t * 0.01)).astype(np.int64)
        pcm = np.stack([base, base + rng.integers(-3, 4, n)], axis=1) if stereo else base
    else:
        pcm = rng.integers(-hi, hi, shape)
    enc = encode_flac(pcm, 44100, bps=bps, block_size=block, as_lpc=as_lpc)
    sr, nch, back, got_bps = decode_flac(enc)
    want = pcm[:, None] if pcm.ndim == 1 else pcm
    assert sr == 44100 and got_bps == bps
    assert np.array_equal(back, want)


def test_flac_integrity_checks_and_sniffing():
    """CRC-8/CRC-16/MD5 must each catch corruption; non-FLAC bytes
    sniff to None rather than raising."""
    import numpy as np
    import pytest as _pytest

    from disq_spark.formats.flac import decode_flac, encode_flac

    rng = np.random.default_rng(4)
    pcm = rng.integers(-30000, 30000, 2000)
    enc = bytearray(encode_flac(pcm, 8000))
    assert decode_flac(b"") is None
    assert decode_flac(b"RIFFnotflac") is None
    assert decode_flac(b"fLaC") is None  # truncated metadata
    # flip one bit inside the first frame's entropy bytes: some CRC
    # (8, 16, or the stream MD5) must reject it
    bad = bytearray(enc)
    bad[60] ^= 0x10
    with _pytest.raises((ValueError, EOFError)):
        decode_flac(bytes(bad))


# ---------------------------------------------------------------------------
# WebP-lossless (VP8L) codec properties (formats/webp.py)
# ---------------------------------------------------------------------------
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    mode=st.sampled_from(
        ["plain", "sg", "cache", "rle", "rle2d", "pal"]
        + [f"pred{m}" for m in range(14)]
        + ["color", "sg+pred"]
    ),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=40, deadline=None)
def test_webp_lossless_roundtrip_property(w, h, mode, seed):
    """VP8L is lossless: every transform/entropy path must round-trip
    pixel-exactly — all 14 predictor modes, the color transform,
    subtract-green, palette (incl. sub-byte bundling), color cache,
    and LZ77 backrefs with both plain and 2D-mapped distances."""
    import numpy as np

    from disq_spark.formats.webp import decode_webp, encode_webp

    rng = np.random.default_rng(seed)
    kw = {}
    if mode == "pal":
        img = (rng.integers(0, rng.integers(2, 20), (h, w)) * 13 % 256).astype(np.uint8)
        img = np.repeat(img[:, :, None], 3, axis=2)
        kw = {"palette": True}
    elif mode.startswith("rle"):
        img = np.repeat(rng.integers(0, 256, (h, max(1, w // 4), 3), dtype=np.uint8), 4, axis=1)[:, :w]
        if img.shape[1] < w:
            img = np.pad(img, ((0, 0), (0, w - img.shape[1]), (0, 0)), mode="edge")
        kw = {"rle": True, "use_2d_dist": mode == "rle2d", "cache_bits": 4}
    else:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        if mode == "sg":
            kw = {"subtract_green": True}
        elif mode == "cache":
            kw = {"cache_bits": 8}
        elif mode.startswith("pred"):
            kw = {"predictor": int(mode[4:]), "size_bits": 2}
        elif mode == "color":
            kw = {"color": (int(rng.integers(0, 256)), int(rng.integers(0, 256)), int(rng.integers(0, 256)))}
        elif mode == "sg+pred":
            kw = {"subtract_green": True, "predictor": int(rng.integers(0, 14))}
    enc = encode_webp(img, **kw)
    dec = decode_webp(enc)
    assert dec is not None
    gw, gh, got = dec
    assert (gw, gh) == (w, h)
    assert np.array_equal(got, img), mode


def test_webp_sniffing_and_malformed():
    import numpy as np

    from disq_spark.formats.webp import decode_webp, encode_webp

    img = np.random.default_rng(1).integers(0, 256, (10, 10, 3), dtype=np.uint8)
    enc = encode_webp(img)
    assert decode_webp(b"") is None
    assert decode_webp(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert decode_webp(enc[: len(enc) // 2]) is None  # truncated
    # a lossy VP8 chunk is not ours
    lossy = enc.replace(b"VP8L", b"VP8 ", 1)
    assert decode_webp(lossy) is None


# ---------------------------------------------------------------------------
# Baseline TIFF codec properties (formats/tiff.py)
# ---------------------------------------------------------------------------
@given(
    w=st.integers(1, 50),
    h=st.integers(1, 50),
    comp=st.sampled_from([1, 5, 32773]),
    pred=st.sampled_from([1, 1, 2]),
    pal=st.booleans(),
    be=st.booleans(),
    rps=st.sampled_from([16, 1, 7]),
    seed=st.integers(0, 2**31),
)
@settings(max_examples=30, deadline=None)
def test_tiff_roundtrip_property(w, h, comp, pred, pal, be, rps, seed):
    """Baseline TIFF round-trips pixel-exactly across compressions
    (none / LZW with the early width change / PackBits), horizontal
    predictor, palette, byte orders, and strip heights (incl. 1-row
    strips, which resets LZW/PackBits state per strip)."""
    import numpy as np

    from disq_spark.formats.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(seed)
    if pal:
        idx = rng.integers(0, rng.integers(2, 30), (h, w)).astype(np.uint8)
        img = np.repeat((idx * 9 % 256)[:, :, None], 3, axis=2)
        kw = {"palette": True}
    else:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        kw = {}
    enc = encode_tiff(img, compression=comp, predictor=pred, big_endian=be, rows_per_strip=rps, **kw)
    dec = decode_tiff(enc)
    assert dec is not None
    gw, gh, got = dec
    assert (gw, gh) == (w, h)
    assert np.array_equal(got, img)


def test_tiff_gray_dispatch_and_malformed():
    import numpy as np

    from disq_spark.formats.tiff import decode_tiff, encode_tiff
    from disq_spark.operators.multimodal import try_decode_image

    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (14, 23), dtype=np.uint8)
    enc = encode_tiff(g, compression=5)
    w, h, got = try_decode_image(enc)
    assert (w, h) == (23, 14) and np.array_equal(got, np.repeat(g[:, :, None], 3, axis=2))
    assert decode_tiff(b"") is None
    assert decode_tiff(b"II*\x00\x08\x00\x00\x00") is None
    assert decode_tiff(b"not a tiff") is None
    assert decode_tiff(enc[:30]) is None


def test_tiff_known_fixture_hand_assembled():
    """Decoder pinned by hand-assembled TIFF bytes (spec-derived, no
    shared code with our encoder — ADVICE r6: round-trips alone can't
    catch a complementary encoder/decoder layout bug): a big-endian
    2x2 RGB uncompressed file, a PackBits grayscale file with
    hand-coded RLE runs, and a WhiteIsZero inversion check."""
    import struct

    import numpy as np

    from disq_spark.formats.tiff import decode_tiff

    def entry(tag, typ, cnt, val):
        return struct.pack(">HHI4s", tag, typ, cnt, val)

    def short_val(v):  # SHORT left-justified in the 4-byte field (BE)
        return struct.pack(">HH", v, 0)

    def long_val(v):
        return struct.pack(">I", v)

    # --- 2x2 RGB, uncompressed, big-endian ------------------------------
    strip = bytes(
        [255, 0, 0,  0, 255, 0,
         0, 0, 255,  17, 34, 51]
    )
    n_entries = 9
    ifd_off = 8
    after_ifd = ifd_off + 2 + n_entries * 12 + 4
    bits_off = after_ifd            # 3 SHORTs = 6 bytes
    data_off = after_ifd + 6
    ifd = struct.pack(">H", n_entries)
    ifd += entry(256, 3, 1, short_val(2))            # ImageWidth
    ifd += entry(257, 3, 1, short_val(2))            # ImageLength
    ifd += entry(258, 3, 3, long_val(bits_off))      # BitsPerSample
    ifd += entry(259, 3, 1, short_val(1))            # Compression=none
    ifd += entry(262, 3, 1, short_val(2))            # Photometric=RGB
    ifd += entry(273, 4, 1, long_val(data_off))      # StripOffsets
    ifd += entry(277, 3, 1, short_val(3))            # SamplesPerPixel
    ifd += entry(278, 3, 1, short_val(2))            # RowsPerStrip
    ifd += entry(279, 4, 1, long_val(len(strip)))    # StripByteCounts
    ifd += struct.pack(">I", 0)                      # next IFD
    tif = b"MM\x00*" + struct.pack(">I", ifd_off) + ifd
    tif += struct.pack(">HHH", 8, 8, 8) + strip
    got = decode_tiff(tif)
    assert got is not None
    w, h, img = got
    assert (w, h) == (2, 2)
    assert img.tolist() == [
        [[255, 0, 0], [0, 255, 0]],
        [[0, 0, 255], [17, 34, 51]],
    ]

    # --- 3x2 grayscale, PackBits, WhiteIsZero ---------------------------
    # rows: [10 10 10], [200 7 7] -> bytes 10*3, 200, 7*2
    # PackBits: run of 3x10 -> (-2, 10); literal 200 -> (0, 200);
    # run of 2x7 -> (-1, 7)
    pb = bytes([0xFE, 10, 0x00, 200, 0xFF, 7])
    n_entries = 8
    after_ifd = 8 + 2 + n_entries * 12 + 4
    data_off = after_ifd
    ifd = struct.pack(">H", n_entries)
    ifd += entry(256, 3, 1, short_val(3))
    ifd += entry(257, 3, 1, short_val(2))
    ifd += entry(258, 3, 1, short_val(8))
    ifd += entry(259, 3, 1, short_val(32773))        # PackBits
    ifd += entry(262, 3, 1, short_val(0))            # WhiteIsZero
    ifd += entry(273, 4, 1, long_val(data_off))
    ifd += entry(278, 3, 1, short_val(2))
    ifd += entry(279, 4, 1, long_val(len(pb)))
    ifd += struct.pack(">I", 0)
    tif2 = b"MM\x00*" + struct.pack(">I", 8) + ifd + pb
    got2 = decode_tiff(tif2)
    assert got2 is not None
    w2, h2, img2 = got2
    assert (w2, h2) == (3, 2)
    inv = [255 - 10, 255 - 200, 255 - 7]
    assert img2.tolist() == [
        [[inv[0]] * 3, [inv[0]] * 3, [inv[0]] * 3],
        [[inv[1]] * 3, [inv[2]] * 3, [inv[2]] * 3],
    ]


def test_flac_known_fixture_hand_assembled():
    """Decoder pinned by hand-assembled FLAC bytes built straight from
    RFC 9639 with an independent bit packer and independent CRC-8/16
    implementations (ADVICE r6: encoder/decoder round-trips can share a
    complementary layout bug): STREAMINFO + one frame with a CONSTANT
    subframe, and a second stream with a VERBATIM subframe."""
    import hashlib
    import struct

    import numpy as np

    from disq_spark.formats.flac import decode_flac

    def crc8(data):  # bitwise, poly x^8+x^2+x+1, independent of the table impl
        crc = 0
        for byte in data:
            crc ^= byte
            for _ in range(8):
                crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        return crc

    def crc16(data):  # poly x^16+x^15+x^2+1 (0x8005)
        crc = 0
        for byte in data:
            crc ^= byte << 8
            for _ in range(8):
                crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        return crc

    class MsbWriter:
        def __init__(self):
            self.bits = []

        def w(self, v, n):
            for i in range(n - 1, -1, -1):
                self.bits.append((v >> i) & 1)

        def bytes(self):
            assert len(self.bits) % 8 == 0
            out = bytearray()
            for i in range(0, len(self.bits), 8):
                out.append(int("".join(map(str, self.bits[i : i + 8])), 2))
            return bytes(out)

    def streaminfo(n_samples, pcm_md5):
        si = MsbWriter()
        si.w(4, 16)       # min blocksize
        si.w(4, 16)       # max blocksize
        si.w(0, 24)       # min framesize (unknown)
        si.w(0, 24)       # max framesize
        si.w(8000, 20)    # sample rate
        si.w(0, 3)        # channels - 1
        si.w(15, 5)       # bits - 1
        si.w(n_samples, 36)
        body = si.bytes() + pcm_md5
        assert len(body) == 34
        return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    def frame(samples, subframe_bits):
        hw = MsbWriter()
        hw.w(0x3FFE, 14)  # sync
        hw.w(0, 1)        # reserved
        hw.w(0, 1)        # fixed blocking
        hw.w(6, 4)        # blocksize: 8-bit at end of header
        hw.w(0, 4)        # sample rate: from STREAMINFO
        hw.w(0, 4)        # 1 channel
        hw.w(4, 3)        # 16-bit samples
        hw.w(0, 1)        # reserved
        hw.w(0, 8)        # frame number 0 (UTF-8)
        hw.w(len(samples) - 1, 8)
        hdr = hw.bytes()
        body = hdr + bytes([crc8(hdr)]) + subframe_bits
        return body + struct.pack(">H", crc16(body))

    # --- CONSTANT subframe: 4 samples of 1234 ---------------------------
    sw = MsbWriter()
    sw.w(0, 1)     # zero pad
    sw.w(0, 6)     # type: CONSTANT
    sw.w(0, 1)     # no wasted bits
    sw.w(1234, 16)
    pcm = struct.pack("<4h", *([1234] * 4))
    blob = streaminfo(4, hashlib.md5(pcm).digest()) + frame([1234] * 4, sw.bytes())
    dec = decode_flac(blob)
    assert dec is not None
    rate, nch, samples, bits = dec
    assert (rate, nch, bits) == (8000, 1, 16)
    assert samples.reshape(-1).tolist() == [1234] * 4

    # --- VERBATIM subframe: distinct values incl. negatives -------------
    vals = [1, -2, 30000, -32768]
    sw = MsbWriter()
    sw.w(0, 1)
    sw.w(1, 6)     # type: VERBATIM
    sw.w(0, 1)
    for v in vals:
        sw.w(v & 0xFFFF, 16)
    pcm = struct.pack("<4h", *vals)
    blob = streaminfo(4, hashlib.md5(pcm).digest()) + frame(vals, sw.bytes())
    dec = decode_flac(blob)
    assert dec is not None
    rate, nch, samples, bits = dec
    assert samples.reshape(-1).tolist() == vals

    # corrupting one payload byte must trip a CRC, not decode silently
    bad = bytearray(blob)
    bad[-5] ^= 0x40
    import pytest as _pt

    with _pt.raises(ValueError):
        decode_flac(bytes(bad))


def test_webp_vp8l_known_fixture_hand_assembled():
    """VP8L decoder pinned by a hand-assembled lossless bitstream built
    straight from the VP8L spec with an independent LSB-first bit
    packer (ADVICE r6): 2x1 image, five simple prefix codes (2-symbol
    G/R/B, 1-symbol A and distance), literal pixels only. Canonical
    code assignment puts the numerically smaller symbol on bit 0."""
    import struct

    from disq_spark.formats.webp import decode_webp

    class LsbWriter:
        def __init__(self):
            self.bits = []

        def w(self, v, n):
            for i in range(n):
                self.bits.append((v >> i) & 1)

        def bytes(self):
            while len(self.bits) % 8:
                self.bits.append(0)
            out = bytearray()
            for i in range(0, len(self.bits), 8):
                byte = 0
                for j in range(8):
                    byte |= self.bits[i + j] << j
                out.append(byte)
            return bytes(out)

    bw = LsbWriter()
    bw.w(1, 14)  # width - 1  (w=2)
    bw.w(0, 14)  # height - 1 (h=1)
    bw.w(0, 1)   # alpha hint
    bw.w(0, 3)   # version
    bw.w(0, 1)   # no transforms
    bw.w(0, 1)   # no color cache
    bw.w(0, 1)   # no meta-huffman

    def simple2(s0, s1):
        bw.w(1, 1)   # simple code
        bw.w(1, 1)   # two symbols
        bw.w(1, 1)   # first symbol in 8 bits
        bw.w(s0, 8)
        bw.w(s1, 8)

    def simple1(sym):
        bw.w(1, 1)   # simple code
        bw.w(0, 1)   # one symbol
        if sym > 1:
            bw.w(1, 1)
            bw.w(sym, 8)
        else:
            bw.w(0, 1)
            bw.w(sym, 1)

    simple2(64, 5)    # G  (alphabet 280)
    simple2(30, 17)   # R
    simple2(200, 9)   # B
    simple1(255)      # A  (zero bits per read)
    simple1(0)        # distance (zero bits per read)

    # canonical two-symbol codes: smaller symbol -> bit 0
    # pixel 0: (r,g,b) = (30, 64, 200) -> G:1 R:1 B:1
    bw.w(1, 1); bw.w(1, 1); bw.w(1, 1)
    # pixel 1: (17, 5, 9) -> G:0 R:0 B:0
    bw.w(0, 1); bw.w(0, 1); bw.w(0, 1)

    payload = b"\x2f" + bw.bytes()
    riff = b"WEBPVP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        riff += b"\x00"
    blob = b"RIFF" + struct.pack("<I", len(riff)) + riff
    got = decode_webp(blob)
    assert got is not None
    w, h, img = got
    assert (w, h) == (2, 1)
    assert img.tolist() == [[[30, 64, 200], [17, 5, 9]]]


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    n=st.integers(1, 30),
    split=st.integers(150, 6000),
    seed=st.integers(0, 2**31),
    gz=st.booleans(),
)
@settings(max_examples=25, deadline=None)
def test_warc_split_exactly_once_property(n, split, seed, gz):
    """Fuzzed split-invariance for the WARC chunk kernel: any record
    set, any split size, gz or plain — every record decoded exactly
    once with exact payload bytes (the fixed matrices in test_warc.py
    pin specific sizes; this sweeps the space). Serial kernel drive on
    memory:// — the same code Spark tasks run."""
    import numpy as np

    from disq_spark import fs
    from disq_spark.formats.warc import build_warc
    from disq_spark.sources.warc import decode_warc_chunks, plan_warc_chunks

    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        payload = bytes(rng.integers(0, 256, int(rng.integers(0, 3000)), dtype=np.uint8))
        if not gz:
            # plain-warc record payloads containing 'WARC/' + CRLFCRLF
            # could be parsed as nested records by a buggy snap; keep
            # them in as adversarial content — the ownership rule must
            # still hold because real record starts are found first
            pass
        recs.append(
            (
                {
                    "WARC-Type": "resource",
                    "WARC-Record-ID": f"<urn:p:{i}>",
                    "WARC-Target-URI": f"https://p/{i}",
                    "Content-Type": "application/octet-stream",
                },
                payload,
            )
        )
    path = f"memory://prop/{seed}-{n}-{gz}.warc" + (".gz" if gz else "")
    with fs.open_output(path) as f:
        f.write(build_warc(recs, gzip_members=gz))
    got = {}
    for pdf in decode_warc_chunks(plan_warc_chunks(path, split)):
        for rid, payload in zip(pdf["record_id"], pdf["payload"]):
            assert rid not in got, f"duplicate {rid} split={split}"
            got[rid] = bytes(payload)
    fs.remove(path)
    assert got == {f"<urn:p:{i}>": recs[i][1] for i in range(n)}
