"""Zstd entropy layer (operators/multimodal14.py): golden-verified
against REAL libzstd output via ctypes, roundtripped through our own
encoder for every planted variant, checksum-verified via XXH64, and
total (decode or ValueError) under hostile mutation."""

from __future__ import annotations

import ctypes
import random
import struct

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators.multimodal13 import (
    decode_zstd_frames,
)
from mit_6_5840_mapreduce_with_go_spark.operators import multimodal14 as M14


def _libzstd():
    try:
        lib = ctypes.CDLL("libzstd.so.1")
    except OSError:  # pragma: no cover - environment without libzstd
        pytest.skip("system libzstd not available")
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_createCCtx.restype = ctypes.c_void_p
    lib.ZSTD_CCtx_setParameter.restype = ctypes.c_size_t
    lib.ZSTD_compress2.restype = ctypes.c_size_t
    return lib


def _zc(lib, src: bytes, level: int = 3, checksum: int = 0) -> bytes:
    cctx = ctypes.c_void_p(lib.ZSTD_createCCtx())
    lib.ZSTD_CCtx_setParameter(cctx, 100, level)  # ZSTD_c_compressionLevel
    lib.ZSTD_CCtx_setParameter(cctx, 201, checksum)  # ZSTD_c_checksumFlag
    bound = lib.ZSTD_compressBound(len(src))
    dst = ctypes.create_string_buffer(bound)
    n = lib.ZSTD_compress2(cctx, dst, bound, src, len(src))
    lib.ZSTD_freeCCtx(cctx)
    assert not lib.ZSTD_isError(n)
    return dst.raw[:n]


def _corpora() -> dict[str, bytes]:
    rng = random.Random(42)
    words = [
        bytes(rng.choice(b"abcdefghijklmnop") for _ in range(rng.randrange(3, 10)))
        for _ in range(200)
    ]
    big = bytearray()
    while len(big) < 300_000:  # > 2 blocks of 128 KiB
        big += rng.choice(words) + b" "
        if rng.random() < 0.01:
            big += bytes(rng.randrange(256) for _ in range(50))
    return {
        "text": b"the quick brown fox jumps over the lazy dog. " * 60,
        "repetitive": bytes([65, 66, 67]) * 500,
        "semi": bytes(rng.choice(b"abcdefgh \n") for _ in range(3000)),
        "binaryish": bytes(rng.randrange(40) for _ in range(2500)),
        "tiny": b"hello world hello world hello!",
        "single": b"x",
        "empty": b"",
        "incompressible": bytes(rng.randrange(256) for _ in range(800)),
        "multiblock": bytes(big),
    }


def test_golden_against_libzstd():
    """Every (corpus, level) real libzstd frame decodes byte-exact —
    this exercises Huffman 1/4-stream, FSE and direct weight trees,
    predefined/FSE/RLE/Repeat sequence modes, and Treeless blocks as
    the reference encoder actually emits them."""
    lib = _libzstd()
    for name, src in _corpora().items():
        for level in (1, 3, 9, 19):
            comp = _zc(lib, src, level)
            got = decode_zstd_frames(comp)
            assert got["content"] == src, (name, level)


def test_golden_checksum_frames_verified():
    lib = _libzstd()
    src = _corpora()["semi"]
    comp = _zc(lib, src, 3, checksum=1)
    assert decode_zstd_frames(comp)["content"] == src
    # flipping a content byte (or the stored checksum) must be caught
    bad = bytearray(comp)
    bad[-1] ^= 0x01
    with pytest.raises(ValueError):
        decode_zstd_frames(bytes(bad))


def test_xxh64_vectors_and_libzstd_agreement():
    assert M14.xxh64(b"") == 0xEF46DB3751D8E999
    # cross-check against libzstd's own stored checksum
    lib = _libzstd()
    src = b"cross-check payload " * 37
    comp = _zc(lib, src, 3, checksum=1)
    (stored,) = struct.unpack("<I", comp[-4:])
    assert M14.xxh64(src) & 0xFFFFFFFF == stored


def _own_variants() -> list[tuple[str, list[dict], dict]]:
    base = bytes((7 + j) % 61 for j in range(80))
    tail = bytes((11 + 3 * j) % 61 for j in range(7))
    lits = base + tail
    seqs = [(len(base), len(base) + 3, 12), (0, 1, 9)]
    pre = ("predef", "predef", "predef")
    big = bytes((35 + j) % 61 for j in range(230)) + tail
    return [
        ("raw_predef", [dict(lits_kind="raw", lits=lits, seqs=seqs, modes=pre)], {}),
        (
            "rle_rlemodes",
            [
                dict(
                    lits_kind="rle",
                    lits=bytes([33]) * 60,
                    seqs=[(50, 53, 8)],
                    modes=("rle", "rle", "rle"),
                )
            ],
            {},
        ),
        (
            "huf1_direct",
            [dict(lits_kind="huf", lits=lits, seqs=seqs, modes=pre, tree="direct")],
            {},
        ),
        (
            "huf4_fse",
            [
                dict(
                    lits_kind="huf",
                    lits=big,
                    seqs=[(230, 233, 12), (0, 1, 9)],
                    modes=("fse", "fse", "fse"),
                    four_stream=True,
                    tree="fse",
                )
            ],
            {},
        ),
        (
            "treeless_repeat",
            [
                dict(lits_kind="huf", lits=lits, seqs=seqs, modes=pre, tree="direct"),
                dict(
                    lits_kind="huf_treeless",
                    lits=bytes((12 + j) % 61 for j in range(40)),
                    seqs=[(40, 108 + 40 + 3, 6)],
                    modes=("repeat", "repeat", "repeat"),
                ),
            ],
            {},
        ),
        ("no_seqs", [dict(lits_kind="huf", lits=lits, seqs=[], modes=pre)], {}),
        (
            "no_fcs_no_cks",
            [dict(lits_kind="huf", lits=lits, seqs=seqs, modes=pre)],
            dict(with_fcs=False, checksum=False),
        ),
    ]


def test_own_encoder_roundtrip_all_variants():
    for name, specs, kw in _own_variants():
        frame, content = M14.encode_compressed_frame(specs, **kw)
        got = decode_zstd_frames(frame)
        assert got["content"] == content, name


def test_repcode_semantics_including_ll0_shift():
    """ll==0 shifts the repcode index (ov=1 -> rep2); a planted pair of
    sequences uses a real offset then rep2==initial-rep... the decoded
    bytes must equal the encoder-side execution twin byte for byte."""
    lits = bytes(range(10, 90))
    # seq0 real offset 40; seq1 ll=0 ov=1 -> rep2 (initial rep2 = 1)
    seqs = [(60, 43, 9), (0, 1, 5)]
    frame, content = M14.encode_compressed_frame(
        [dict(lits_kind="raw", lits=lits, seqs=seqs, modes=("predef",) * 3)]
    )
    assert decode_zstd_frames(frame)["content"] == content
    # rep2==1 repeats the last byte: verify the tail shape explicitly
    assert content[60 + 9 : 60 + 9 + 5] == bytes([content[60 + 9 - 1]]) * 5


def test_planted_query_stats_census():
    """All five corpus variants decode with the expected census."""
    want_blocks = {0: 1, 1: 1, 2: 1, 3: 1, 4: 2}
    want_seqs = {0: 2, 1: 1, 2: 2, 3: 2, 4: 3}
    for d in range(37):
        m = decode_zstd_frames(M14._zstd_entropy_payload(d))
        f = m["frames"][0]
        assert f["n_blocks"] == want_blocks[d % 5], d
        assert f["n_sequences"] == want_seqs[d % 5], d
        assert f["huf_tlog"] == (6 if d % 5 in (2, 3, 4) else 0), d
        assert f["fcs"] == f["content_len"], d


def test_hostile_mutations_total():
    """Byte flips and truncations over real-libzstd and own-encoder
    frames either decode or raise ValueError — never anything else,
    never a hang."""
    lib = _libzstd()
    rng = random.Random(7)
    frames = [
        _zc(lib, _corpora()["semi"], 3, checksum=1),
        _zc(lib, _corpora()["text"], 19),
        M14.encode_compressed_frame(_own_variants()[3][1])[0],
        M14._zstd_entropy_payload(123),
    ]
    for frame in frames:
        for _ in range(300):
            mut = bytearray(frame)
            k = rng.randrange(3)
            if k == 0:
                mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
            elif k == 1:
                mut = mut[: rng.randrange(len(mut))]
            else:
                pos = rng.randrange(len(mut))
                mut[pos] = rng.randrange(256)
            try:
                decode_zstd_frames(bytes(mut))
            except ValueError:
                pass


def test_fse_table_description_roundtrip():
    probs = [4, 3, 2, 2, 2, 0, 0, 1, -1, -1, 48]  # sums to 64 with 2 low
    blob = M14.fse_write_table_desc(probs, 6)
    fb = M14._FwdBits(blob)
    got, alog = M14.fse_read_table_desc(fb, 9)
    assert alog == 6
    assert got == probs


def test_predefined_distributions_build():
    for kind, nsym in (("ll", 36), ("of", 29), ("ml", 53)):
        t = M14._predef(kind)
        assert t.size == {"ll": 64, "of": 32, "ml": 64}[kind]
        assert max(t.sym) == nsym - 1
        # every baseline+2^nbits range stays inside the table
        for u in range(t.size):
            assert 0 <= t.base[u] and t.base[u] + (1 << t.nbits[u]) <= t.size


def test_huffman_weight_completion_and_codes():
    lits = bytes([1, 1, 1, 1, 2, 2, 3, 4, 5, 6, 7])
    w = M14._huf_assign_weights(lits)
    total = sum(1 << (x - 1) for x in w if x > 0)
    assert total & (total - 1) == 0  # exact power of two
    codes, tlog = M14._huf_codes(w)
    enc = M14._huf_encode_stream(lits, codes)
    table, tlog2 = M14._huf_table_from_weights(w)
    assert tlog2 == tlog
    assert bytes(M14.huf_decode_stream(enc, table, tlog, len(lits))) == lits


def _train_dict(lib) -> bytes:
    import ctypes

    c_sz = ctypes.c_size_t
    lib.ZDICT_trainFromBuffer.restype = c_sz
    lib.ZDICT_trainFromBuffer.argtypes = [
        ctypes.c_void_p, c_sz, ctypes.c_char_p, ctypes.POINTER(c_sz), ctypes.c_uint,
    ]
    lib.ZDICT_isError.restype = ctypes.c_uint
    rng = random.Random(3)
    words = [
        bytes(rng.choice(b"abcdefghij") for _ in range(rng.randrange(4, 9)))
        for _ in range(30)
    ]
    samples = [b" ".join(rng.choice(words) for _ in range(60)) for _ in range(120)]
    blob = b"".join(samples)
    sizes = (c_sz * len(samples))(*[len(s) for s in samples])
    dbuf = ctypes.create_string_buffer(4096)
    n = lib.ZDICT_trainFromBuffer(dbuf, 4096, blob, sizes, len(samples))
    assert not lib.ZDICT_isError(n)
    return dbuf.raw[:n], words


def test_golden_dictionary_frames_against_libzstd():
    """ZDICT-trained structured dictionary + ZSTD_compress_usingDict
    frames decode byte-exact through parse_zstd_dictionary + the
    dict-seeded frame walk (dict window matches, dict entropy tables,
    dict repcodes — as the reference encoder actually uses them)."""
    import ctypes

    lib = _libzstd()
    c_sz = ctypes.c_size_t
    lib.ZSTD_compressBound.argtypes = [c_sz]
    lib.ZSTD_compress_usingDict.restype = c_sz
    lib.ZSTD_compress_usingDict.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, c_sz,
        ctypes.c_char_p, c_sz, ctypes.c_char_p, c_sz, ctypes.c_int,
    ]
    lib.ZSTD_freeCCtx.argtypes = [ctypes.c_void_p]
    dict_bytes, words = _train_dict(lib)
    d = M14.parse_zstd_dictionary(dict_bytes)
    rng = random.Random(11)
    for k in range(6):
        src = b" ".join(rng.choice(words) for _ in range(40 + 40 * k))
        for level in (1, 3, 9, 19):
            cctx = ctypes.c_void_p(lib.ZSTD_createCCtx())
            bound = lib.ZSTD_compressBound(len(src))
            dst = ctypes.create_string_buffer(bound)
            n = lib.ZSTD_compress_usingDict(
                cctx, dst, bound, src, len(src), dict_bytes, len(dict_bytes), level
            )
            lib.ZSTD_freeCCtx(cctx)
            assert not lib.ZSTD_isError(n)
            got = decode_zstd_frames(
                dst.raw[:n], dictionaries={d["dict_id"]: dict_bytes}
            )
            assert got["content"] == src, (k, level)


def test_planted_dictionary_query_semantics():
    """Planted dict frames decode exactly AND are undecodable without
    the dictionary (they really use its tables/window/repcodes)."""
    for d in (0, 7, 61, 123, 4096):
        db, fb = M14._zstd_dict_payload(d)
        dd = M14.parse_zstd_dictionary(db)
        meta = decode_zstd_frames(fb, dictionaries={dd["dict_id"]: dd})
        assert meta["frames"][0]["n_sequences"] == 2
        with pytest.raises(ValueError):
            decode_zstd_frames(fb)


def test_hostile_dictionary_mutations_total():
    rng = random.Random(5)
    db, fb = M14._zstd_dict_payload(99)
    for _ in range(300):
        mut = bytearray(db)
        k = rng.randrange(3)
        if k == 0:
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        elif k == 1:
            mut = mut[: rng.randrange(len(mut))]
        else:
            mut[rng.randrange(len(mut))] = rng.randrange(256)
        try:
            dd = M14.parse_zstd_dictionary(bytes(mut))
            decode_zstd_frames(fb, dictionaries={dd["dict_id"]: dd})
        except ValueError:
            pass


def test_systematic_overwrite_sweep_total():
    """Repo-convention structure-aware sweep: EVERY byte offset of a
    planted entropy frame and a dictionary pair gets overwritten (0x00,
    0xFF, +1) — decode must return or raise ValueError at every single
    position, never hang or raise anything else."""
    frame = M14._zstd_entropy_payload(17)
    db, fb = M14._zstd_dict_payload(17)
    dd_ok = M14.parse_zstd_dictionary(db)

    def sweep(blob, decode):
        for pos in range(len(blob)):
            for val in (0x00, 0xFF, (blob[pos] + 1) & 0xFF):
                if val == blob[pos]:
                    continue
                mut = bytearray(blob)
                mut[pos] = val
                try:
                    decode(bytes(mut))
                except ValueError:
                    pass

    sweep(frame, decode_zstd_frames)
    sweep(fb, lambda b: decode_zstd_frames(b, dictionaries={dd_ok["dict_id"]: dd_ok}))
    sweep(db, M14.parse_zstd_dictionary)


def test_zst_source_partition_granularity_and_parity(spark, sf_dir):
    """The zstfile source yields one input partition per shard, and the
    per-frame census equals the payload-column pipeline's (file-source
    == column parity over the SAME corpus)."""
    from mit_6_5840_mapreduce_with_go_spark.operators.multimodal14 import (
        mm_decode_zstd_entropy_stats,
        mm_zst_source_stats,
    )

    src = mm_zst_source_stats(spark, sf_dir)
    assert src.rdd.getNumPartitions() == 8  # one per shard
    got = {
        (r["file"], r["frame_index"]): (
            r["n_blocks"], r["n_sequences"], r["n_literals"],
            r["content_len"], r["content_sum"],
        )
        for r in src.collect()
    }
    col = mm_decode_zstd_entropy_stats(spark, sf_dir).collect()
    # rebuild the shard mapping: doc -> (shard file, in-shard rank)
    by_shard: dict[int, list[int]] = {}
    for r in col:
        by_shard.setdefault(r["doc_id"] % 8, []).append(r["doc_id"])
    want = {}
    for s, docs in by_shard.items():
        for idx, d in enumerate(sorted(docs)):
            row = next(r for r in col if r["doc_id"] == d)
            want[(f"shard-{s:03d}.zst", idx)] = (
                row["n_blocks"], row["n_sequences"], row["n_literals"],
                row["content_len"], row["content_sum"],
            )
    assert got == want and len(got) > 0


def test_seekable_pruning_never_touches_skipped_frames(spark, tmp_path):
    """A corrupt frame planted BELOW the pruning threshold decodes the
    shard fine in pruning mode (proof the reader jumps by seek-table
    offsets and never decodes skipped frames), while a full walk of the
    same shard raises."""
    from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
        parse_seek_table,
        read_zst_source_seekable,
        write_seekable_shard,
    )

    frames, contents = [], []
    for d in (3, 123, 7):  # variants 3 (big, kept) / 3 / 2
        fr, ct = M14._zstd_entropy_frame_and_content(d)
        frames.append(fr)
        contents.append(ct)
    # corrupt a SMALL frame (variant 2, content ~80-180 bytes < the big
    # v3 frames): flip bytes mid-frame, but keep its seek-table entry
    small = bytearray(frames[2])
    small[len(small) // 2] ^= 0xFF
    small[len(small) // 2 + 1] ^= 0xFF
    frames[2] = bytes(small)
    shard = write_seekable_shard(frames, contents)
    p = tmp_path / "corrupt-shard.zst"
    p.write_bytes(shard)
    entries = parse_seek_table(shard)
    assert entries is not None and len(entries) == 3
    threshold = max(len(contents[2]) + 1, 200)
    got = read_zst_source_seekable(spark, str(p), threshold).collect()
    kept = {r["frame_index"] for r in got}
    assert 2 not in kept and kept, kept  # corrupt frame skipped, others decoded
    # the full (non-pruning) walk must hit the corruption
    with pytest.raises(Exception):
        from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
            read_zst_source,
        )

        read_zst_source(spark, str(p)).collect()


def test_seek_table_roundtrip_and_hostile():
    from mit_6_5840_mapreduce_with_go_spark.sources.zstfiles import (
        parse_seek_table,
        write_seekable_shard,
    )

    frames, contents = zip(
        *(M14._zstd_entropy_frame_and_content(d) for d in range(5))
    )
    shard = write_seekable_shard(list(frames), list(contents))
    entries = parse_seek_table(shard)
    assert [e["c_size"] for e in entries] == [len(f) for f in frames]
    assert [e["d_size"] for e in entries] == [len(c) for c in contents]
    assert all(
        e["checksum"] == M14.xxh64(c) & 0xFFFFFFFF
        for e, c in zip(entries, contents)
    )
    # a non-seekable stream reports None (not an error)
    assert parse_seek_table(b"".join(frames)) is None
    # hostile mutations of the table area: ValueError or clean parse
    rng = random.Random(9)
    for _ in range(300):
        mut = bytearray(shard)
        pos = rng.randrange(len(shard) - 80, len(shard))
        mut[pos] ^= 1 << rng.randrange(8)
        try:
            parse_seek_table(bytes(mut))
        except ValueError:
            pass
