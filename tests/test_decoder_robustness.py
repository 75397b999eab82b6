"""Decoder totality: every container/codec decoder in the package is
TOTAL over corrupt input — any truncation and any single-byte flip
either raises ValueError or returns a result, never an IndexError /
struct.error / ZeroDivisionError / UnicodeDecodeError crash.  Wild
crawl data is mostly slightly-broken data; a decoder that dies with a
stray exception type kills the whole Arrow batch instead of routing
one record to quarantine.

(Caught and fixed by this sweep in round 7: GIF truncated-descriptor
and missing-LZW-size IndexErrors, progressive-JPEG truncated-segment
and invalid-Ss/Se and zero-sampling-factor crashes, baseline-JPEG DHT
short-BITS/short-vals IndexErrors, QOI truncated-LUMA IndexError,
EXIF short-TIFF-header struct.error and zero-count fields.)"""

from __future__ import annotations

import pytest

from mit_6_5840_mapreduce_with_go_spark.operators import (
    multimodal as M0,
    multimodal2 as M2,
    multimodal3 as M3,
    multimodal4 as M4,
    multimodal6 as M6,
    multimodal7 as M7,
    multimodal8 as M8,
    multimodal9 as M9,
    multimodal10 as M10,
    multimodal11 as M11,
)


def _pix(x, y, c):
    return (x * 7 + y * 19 + c * 11) % 256


def _cases():
    return {
        "ppm": (
            M0.decode_ppm,
            b"P6\n4 3\n255\n"
            + bytes(
                _pix(x, y, c)
                for y in range(3)
                for x in range(4)
                for c in range(3)
            ),
        ),
        "png": (M2.decode_png, M2.encode_png(6, 7, _pix, interlace=True)),
        "png_palette": (M2.decode_png_pixels, M2._pal_payload(7)),
        "png16": (M2.decode_png_pixels, M2._png16_payload(4)),
        "png_trns": (M2.decode_png_pixels, M2._png16_payload(7)),
        "jpeg_gray": (
            M3.decode_jpeg_gray,
            M3.encode_jpeg_gray(16, 16, lambda bx, by: 77),
        ),
        "jpeg_color": (
            M3.decode_jpeg_color,
            M3.encode_jpeg_ycbcr(
                16, 16, lambda bx, by: 90, lambda bx, by: 120, lambda bx, by: 140
            ),
        ),
        "jpeg_progressive": (
            M8.decode_jpeg_progressive_gray,
            M8.encode_jpeg_progressive(16, 16, [(1, 1, lambda x, y: 64)], ac_al=1),
        ),
        "gif": (
            M6.decode_gif,
            M6.encode_gif(
                5, 4, [(i, i, i) for i in range(8)], lambda x, y: (x + y) % 8
            ),
        ),
        "gif_animation": (
            M6.decode_gif_frames,
            M6.encode_gif_animation(
                6, 5, [(i, i, i) for i in range(8)],
                [lambda x, y, f=f: (x + y + f) % 8 for f in range(3)],
                [10, 20, 30],
            ),
        ),
        "qoi": (
            M7.decode_qoi,
            M7.encode_qoi(
                4, 3, lambda x, y: (_pix(x, y, 0), _pix(x, y, 1), _pix(x, y, 2))
            ),
        ),
        "wav": (M4.decode_wav, M4.encode_wav(50, lambda i: (i * 3) % 2000 - 1000)),
        "y4m": (
            lambda p: M4.decode_y4m_sampled(p, 1),
            M4.encode_y4m(8, 6, 2, lambda f, x, y: (f + x + y) % 256),
        ),
        "gzip": (
            M9.decode_gzip_member,
            M9.encode_gzip_member(b"hello world" * 5, fname="x", fhcrc=True),
        ),
        "tar_pax": (
            M9.decode_tar,
            M9.encode_tar(
                [("a.txt", 5, b"hello"), ("b" * 120, 6, b"world!")], fmt="pax"
            ),
        ),
        "zip_streamed": (
            M9.decode_zip,
            M9.encode_zip([("x.py", b"data" * 10, True, True), ("y", b"z", False)]),
        ),
        "bmp": (M9.decode_bmp, M9.encode_bmp(5, 4, _pix)),
        "warc_gz": (M10.decode_warc_gz, M10._warc_crawl(11)),
        "http": (
            M10.parse_http_response,
            M10.encode_http_response(
                200, "OK", [("A", "b")], b"hello" * 10, chunked=True
            ),
        ),
        "zlib": (M10.decode_zlib_container, M10.encode_zlib_container(b"q" * 100)),
        "utf8": (M10.validate_utf8, M10._utf8_payload(7)),
        "exif": (
            M11.decode_exif,
            M11.encode_exif_app1(
                [(0x0112, 3, 5), (0x010F, 2, "maker"), (0x011A, 5, (7, 3))]
            ),
        ),
        "exif_jpeg": (M11.exif_from_jpeg, M11._exif_jpeg(3)),
        "mp3": (
            M11.decode_mp3_frames,
            M11.encode_mp3_stream([(9, 0), (11, 1), (9, 2)], id3_size=20),
        ),
        "flac": (
            M11.decode_flac_streaminfo,
            M11.encode_flac_streaminfo(
                sample_rate=44100, channels=2, bits_per_sample=16,
                total_samples=44100 * 3,
                extra_blocks=[(4, b"vendor\x00tag")],
            ),
        ),
        "auto_dispatch": (M0.decode_image_auto, M0._auto_payload(9)),
        "parquet_footer": (_parquet_decode, _parquet_payload()),
        "id3v2": (_id3_decode, _id3_payload()),
        "zstd": (_zstd_decode, _zstd_payload_rb()),
        "avro": (_avro_decode, _avro_payload_rb()),
        "tfrecord": (_tfrecord_decode, _tfrecord_payload_rb()),
        "safetensors": (_st_decode, _st_payload_rb()),
        "npz": (_npz_decode, _npz_payload_rb()),
        "orc": (_orc_decode, _orc_payload_rb()),
        "any_dispatch": (_any_decode, _orc_payload_rb()),
    }


def _orc_decode(p):
    from mit_6_5840_mapreduce_with_go_spark.operators import lakehouse

    return lakehouse.decode_orc_footer(p)


def _orc_payload_rb():
    from mit_6_5840_mapreduce_with_go_spark.operators import lakehouse

    return lakehouse._orc_payload(6)


def _any_decode(p):
    from mit_6_5840_mapreduce_with_go_spark.operators import dispatch3

    return dispatch3.decode_any_auto(p)


def _st_decode(p):
    from mit_6_5840_mapreduce_with_go_spark.operators import tensors

    return tensors.decode_safetensors(p)


def _st_payload_rb():
    from mit_6_5840_mapreduce_with_go_spark.operators import tensors

    return tensors._st_payload(4)


def _npz_decode(p):
    from mit_6_5840_mapreduce_with_go_spark.operators import tensors

    return tensors.decode_npz(p)


def _npz_payload_rb():
    from mit_6_5840_mapreduce_with_go_spark.operators import tensors

    return tensors._npz_payload(4)


def _tfrecord_decode(p):
    from mit_6_5840_mapreduce_with_go_spark.operators import tfrecord

    return [
        tfrecord.decode_tf_example(f)
        for f in tfrecord.decode_tfrecord_frames(p)
    ]


def _tfrecord_payload_rb():
    from mit_6_5840_mapreduce_with_go_spark.operators import tfrecord

    return tfrecord._tfrecord_payload(8)


def _avro_decode(p):
    from mit_6_5840_mapreduce_with_go_spark.operators import avro_container

    return avro_container.decode_avro_container(p)


def _avro_payload_rb():
    from mit_6_5840_mapreduce_with_go_spark.operators import avro_container

    return avro_container._avro_payload(6)


def _zstd_decode(p):
    from mit_6_5840_mapreduce_with_go_spark.operators import multimodal13

    return multimodal13.decode_zstd_frames(p)


def _zstd_payload_rb():
    from mit_6_5840_mapreduce_with_go_spark.operators import multimodal13

    return multimodal13._zstd_payload(13)


def _id3_decode(p):
    from mit_6_5840_mapreduce_with_go_spark.operators import multimodal12

    return multimodal12.decode_id3_frames(p)


def _id3_payload():
    from mit_6_5840_mapreduce_with_go_spark.operators import multimodal12

    return multimodal12._id3_mp3_payload(11)


def _parquet_decode(p):
    from mit_6_5840_mapreduce_with_go_spark.operators import parquet_footer

    return parquet_footer.decode_parquet_footer(p)


def _parquet_payload():
    from mit_6_5840_mapreduce_with_go_spark.operators import parquet_footer

    return parquet_footer._parquet_payload(5)


@pytest.mark.parametrize("name", sorted(_cases()))
def test_every_truncation_is_a_valueerror(name):
    fn, pay = _cases()[name]
    fn(pay)  # the untouched payload must decode
    for ln in range(len(pay)):
        try:
            fn(pay[:ln])
        except ValueError:
            pass  # the only acceptable failure mode


@pytest.mark.parametrize("name", sorted(_cases()))
def test_every_byte_flip_is_total(name):
    """Flip each byte three ways (sampled stride keeps the suite fast;
    the exhaustive sweep runs out-of-band and found the round-7 bugs).
    The decoder must return or raise ValueError — nothing else."""
    fn, pay = _cases()[name]
    for pos in range(0, len(pay), 3):
        for flip in (0x01, 0x80, 0xFF):
            mut = bytearray(pay)
            mut[pos] ^= flip
            try:
                fn(bytes(mut))
            except ValueError:
                pass


def test_random_garbage_never_crashes_the_dispatcher():
    """Arbitrary byte strings into decode_image_auto (the
    undifferentiated-column entry point): ValueError or a valid dict,
    never another exception.  Seeded LCG keeps the corpus stable."""
    state = 0x2545F4914F6CDD1D
    for trial in range(400):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        n = state % 64
        buf = bytearray()
        s = state
        for _ in range(n):
            s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            buf.append(s >> 56)
        # half the trials get a real magic prefix so the routed decoder
        # (not just the dispatch) sees the garbage
        if trial % 2:
            magic = (b"P6", b"\x89PNG\r\n\x1a\n", b"\xff\xd8", b"GIF89a",
                     b"qoif", b"BM", b"YUV4MPEG2")[trial % 7]
            buf = bytearray(magic) + buf
        try:
            out = M0.decode_image_auto(bytes(buf))
            assert isinstance(out, dict) and "format" in out
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# Structure-aware mutations (round 8): byte flips usually die on a CRC
# long before a parser sees them, so offset-heavy formats (EXIF IFD and
# out-of-line value offsets, FLAC 24-bit block lengths, MP3 syncsafe
# ID3 sizes and frame-length arithmetic, the streamed-ZIP central-
# directory/descriptor walk) get a dedicated sweep: every 2- and 4-byte
# window in the payload is OVERWRITTEN with coherent hostile values
# (zero, one, all-ones, the payload length, length-1, sign-boundary
# values), little- and big-endian — exactly the values a mis-bounded
# seek/length computation turns into an out-of-range read.  Totality
# contract is the same: ValueError or success, nothing else.
# ---------------------------------------------------------------------------

_STRUCTURED_CASES = [
    "exif",
    "exif_jpeg",
    "flac",
    "mp3",
    "zip_streamed",
    "tar_pax",
    "parquet_footer",
    "id3v2",
    "zstd",
    "avro",
    "tfrecord",
    "safetensors",
    "npz",
    # round 9: the ORC tail-first walk is ALL offsets (postscript
    # length byte, footer length, stripe extents) — swept directly and
    # through the total dispatcher
    "orc",
    "any_dispatch",
]


@pytest.mark.parametrize("name", _STRUCTURED_CASES)
def test_hostile_field_overwrites_are_total(name):
    import struct as _struct

    fn, pay = _cases()[name]
    fn(pay)
    n = len(pay)
    u16s = {0, 1, 0xFFFF, 0x8000, n & 0xFFFF, (n - 1) & 0xFFFF}
    u32s = {0, 1, 0xFFFFFFFF, 0x7FFFFFFF, 0x80000000, n, n - 1, n + 1}
    for width, values, fmts in (
        (2, u16s, ("<H", ">H")),
        (4, u32s, ("<I", ">I")),
    ):
        for pos in range(0, n - width + 1):
            for v in values:
                for fmt in fmts:
                    mut = bytearray(pay)
                    mut[pos : pos + width] = _struct.pack(fmt, v)
                    try:
                        fn(bytes(mut))
                    except ValueError:
                        pass  # the only acceptable failure mode
