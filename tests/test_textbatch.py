"""Columnar text->Arrow decoding shared by the jar-free wire sources."""

from __future__ import annotations

import decimal

import pyarrow as pa
import pytest
from pyspark.sql import types as T
from pyspark.sql.types import StructType

from strake_spark.errors import SourceError
from strake_spark.sources.textbatch import TextBatchBuilder, arrow_type


def _schema(*fields) -> StructType:
    return StructType([T.StructField(n, t, True) for n, t in fields])


class TestArrowTypeMapping:
    def test_full_matrix(self):
        assert arrow_type(T.IntegerType()) == pa.int32()
        assert arrow_type(T.LongType()) == pa.int64()
        assert arrow_type(T.DoubleType()) == pa.float64()
        assert arrow_type(T.DecimalType(38, 10)) == pa.decimal128(38, 10)
        assert arrow_type(T.BooleanType()) == pa.bool_()
        assert arrow_type(T.DateType()) == pa.date32()
        assert arrow_type(T.TimestampNTZType()) == pa.timestamp("us")
        assert arrow_type(T.TimestampType()) == pa.timestamp("us", tz="UTC")
        assert arrow_type(T.StringType()) == pa.string()

    def test_unsupported_type_raises(self):
        with pytest.raises(SourceError, match="cannot decode"):
            arrow_type(T.ArrayType(T.IntegerType()))


class TestBuilder:
    def test_bytes_and_str_cells_parse_identically(self):
        b = TextBatchBuilder(_schema(("i", T.LongType()), ("s", T.StringType())))
        b.add_row([b"7", b"x"])
        b.add_row(["8", "y"])
        b.add_row([None, None])
        batch = b.flush()
        assert batch.column(0).to_pylist() == [7, 8, None]
        assert batch.column(1).to_pylist() == ["x", "y", None]

    def test_decimal_38_digits_exact(self):
        b = TextBatchBuilder(_schema(("d", T.DecimalType(38, 10))))
        b.add_row([b"1234567890123456789012345678.0123456789"])
        batch = b.flush()
        assert batch.column(0).to_pylist() == [
            decimal.Decimal("1234567890123456789012345678.0123456789")
        ]

    def test_decimal_overflow_guard_raises_not_corrupts(self):
        # pyarrow 16's string->decimal cast silently wraps on overflow;
        # the builder's digit guard must turn that into a loud error
        b = TextBatchBuilder(_schema(("d", T.DecimalType(10, 2))))
        b.add_row([b"123456789012345678901234567890123456789012345"])
        with pytest.raises(SourceError, match="integer digits"):
            b.flush()

    def test_decimal_overflow_within_text_width_still_caught(self):
        """'9999.99' has 4 integer digits > decimal(5,2)'s 3 but is only
        7 chars wide — a width-based guard would let it wrap silently."""
        b = TextBatchBuilder(_schema(("d", T.DecimalType(5, 2))))
        b.add_row([b"9999.99"])
        with pytest.raises(SourceError, match="integer digits"):
            b.flush()

    def test_decimal_leading_zeros_not_counted(self):
        b = TextBatchBuilder(_schema(("d", T.DecimalType(5, 2))))
        b.add_row([b"0.50"])
        b.add_row([b"-007.25"])
        b.add_row([b"999.99"])
        import decimal

        assert b.flush().column(0).to_pylist() == [
            decimal.Decimal("0.50"), decimal.Decimal("-7.25"),
            decimal.Decimal("999.99"),
        ]

    def test_bool_styles(self):
        tf = TextBatchBuilder(_schema(("b", T.BooleanType())), bool_style="tf")
        tf.add_row([b"t"])
        tf.add_row([b"f"])
        tf.add_row([None])
        assert tf.flush().column(0).to_pylist() == [True, False, None]
        word = TextBatchBuilder(_schema(("b", T.BooleanType())), bool_style="word")
        word.add_row([b"true"])
        word.add_row([b"0"])
        assert word.flush().column(0).to_pylist() == [True, False]

    def test_timestamps_and_dates(self):
        import datetime

        b = TextBatchBuilder(_schema(
            ("d", T.DateType()), ("ts", T.TimestampNTZType()),
            ("tz", T.TimestampType()),
        ))
        b.add_row([b"2024-03-01", b"2024-03-01 10:30:00.123456",
                   b"2024-03-01 10:30:00+00"])
        batch = b.flush()
        assert batch.column(0).to_pylist() == [datetime.date(2024, 3, 1)]
        assert batch.column(1).to_pylist() == [
            datetime.datetime(2024, 3, 1, 10, 30, 0, 123456)
        ]
        assert batch.column(2).to_pylist()[0].timestamp() == datetime.datetime(
            2024, 3, 1, 10, 30, tzinfo=datetime.timezone.utc
        ).timestamp()

    def test_chunking_emits_at_batch_rows(self):
        b = TextBatchBuilder(_schema(("i", T.IntegerType())), batch_rows=3)
        out = []
        for i in range(7):
            got = b.add_row([str(i)])
            if got is not None:
                out.append(got)
        tail = b.flush()
        assert [x.num_rows for x in out] == [3, 3]
        assert tail.num_rows == 1
        assert b.flush() is None  # drained

    def test_width_mismatch_raises(self):
        b = TextBatchBuilder(_schema(("a", T.IntegerType()), ("b", T.IntegerType())))
        b.add_row([b"1"])
        with pytest.raises(SourceError, match="width mismatch"):
            b.flush()

    def test_garbage_numeric_text_raises_with_column_name(self):
        b = TextBatchBuilder(_schema(("n", T.LongType())))
        b.add_row([b"not-a-number"])
        with pytest.raises(SourceError, match="'n'"):
            b.flush()


class TestFrameSampling:
    def test_frame_fanout_and_coverage(self, spark):
        from strake_spark.data import table
        from strake_spark.operators.multimodal import attach_binary, sample_frames
        from tests.conftest import SF_DIR

        docs = table(spark, SF_DIR, "documents").limit(50)
        payload = attach_binary(docs)
        frames = sample_frames(payload, frame_bytes=64, every_k=4)
        pdf = frames.toPandas()
        sizes = {r.doc_id: len(bytes(r.payload)) for r in payload.collect()}
        got = pdf.groupby("doc_id").size().to_dict()
        import math
        for doc_id, n in got.items():
            n_frames = math.ceil(sizes[doc_id] / 64)
            assert n == math.ceil(n_frames / 4)
        # sampled frames are the every-4th byte slices, byte-exact
        row = pdf.iloc[0]
        assert row.frame_idx % 4 == 0
        assert len(bytes(row.frame)) <= 64

    def test_reassembly_when_every_k_is_one(self, spark):
        from strake_spark.data import table
        from strake_spark.operators.multimodal import attach_binary, sample_frames
        from tests.conftest import SF_DIR

        docs = table(spark, SF_DIR, "documents").limit(5)
        payload = attach_binary(docs)
        originals = {r.doc_id: bytes(r.payload) for r in payload.collect()}
        frames = sample_frames(payload, frame_bytes=32, every_k=1).toPandas()
        for doc_id, grp in frames.groupby("doc_id"):
            joined = b"".join(
                bytes(f) for f in grp.sort_values("frame_idx")["frame"]
            )
            assert joined == originals[doc_id]

    def test_validations(self, spark):
        import pytest
        from strake_spark.data import table
        from strake_spark.operators.multimodal import attach_binary, sample_frames
        from tests.conftest import SF_DIR

        payload = attach_binary(table(spark, SF_DIR, "documents").limit(1))
        with pytest.raises(ValueError):
            sample_frames(payload, frame_bytes=0)
        with pytest.raises(ValueError):
            sample_frames(payload, every_k=0)


def _synthetic_png_payloads(spark, n=16):
    from strake_spark.operators.multimodal import synthetic_png_payloads

    return synthetic_png_payloads(spark.range(n).selectExpr("id as doc_id"))


class TestImageCodec:
    """decode_image / resize_images went REAL in r17 (pure zlib+numpy
    PNG codec over mapInPandas; the pre-r17 NotImplementedError stub is
    gone). These pin the codec against an independent reference:
    Spark's own JVM image source (javax.imageio) and exact arithmetic."""

    def test_png_roundtrip_all_shapes(self):
        import numpy as np

        from strake_spark.operators.multimodal import decode_png, encode_png

        rng = np.random.default_rng(7)
        for shape in [(3, 5), (4, 2, 3), (2, 7, 4), (1, 1, 3), (6, 1)]:
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            out = decode_png(encode_png(img))
            want = img if img.ndim == 3 else img[:, :, None]
            np.testing.assert_array_equal(out, want)

    def test_decode_matches_jvm_imageio(self, spark, tmp_path):
        """Cross-decoder pin: our pure-Python decoder and the JVM's
        javax.imageio must agree on dims, channels, and pixel bytes
        (the JVM source emits BGR byte order; ours is RGB)."""
        import numpy as np

        from strake_spark.operators.multimodal import (
            decode_png,
            encode_png,
            read_images,
        )

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
        png = encode_png(img)
        (tmp_path / "a.png").write_bytes(png)
        jvm = read_images(spark, str(tmp_path)).collect()[0]
        assert (jvm.width, jvm.height, jvm.n_channels) == (4, 5, 3)
        jvm_pixels = np.frombuffer(bytes(jvm.data), np.uint8).reshape(5, 4, 3)
        np.testing.assert_array_equal(jvm_pixels[:, :, ::-1], decode_png(png))

    def test_decode_image_sums_exact(self, spark):
        import numpy as np

        from strake_spark.operators.multimodal import decode_image

        payloads = _synthetic_png_payloads(spark, n=12)
        got = decode_image(payloads).toPandas().set_index("doc_id")
        for doc_id in range(12):
            w, h = 1 + doc_id % 7, 1 + doc_id % 5
            x, y = np.arange(w), np.arange(h)
            row = got.loc[doc_id]
            assert (row.width, row.height, row.n_channels) == (w, h, 3)
            assert row.ch0_sum == h * int(((x * 17 + doc_id) % 256).sum())
            assert row.ch1_sum == w * int(((y * 29) % 256).sum())
            assert row.ch2_sum == int((np.add.outer(y, x) % 256).sum())
            assert row.err is None

    def test_decode_image_bad_payload_surfaces_err(self, spark):
        import pandas as pd

        from strake_spark.operators.multimodal import decode_image

        pdf = pd.DataFrame({"doc_id": [1], "payload": [b"not a png"]})
        sdf = spark.createDataFrame(pdf)
        out = decode_image(sdf).toPandas().iloc[0]
        assert out.err is not None and "PNG" in out.err
        assert pd.isna(out.width)

    def test_resize_nearest_neighbor_exact(self, spark):
        import numpy as np
        import pandas as pd

        from strake_spark.operators.multimodal import (
            decode_png,
            encode_png,
            resize_images,
        )

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(6, 8, 3), dtype=np.uint8)
        sdf = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0], "payload": [encode_png(img)]})
        )
        out = resize_images(sdf, width=4, height=3).toPandas().iloc[0]
        got = decode_png(bytes(out.resized))
        ys = np.minimum(((np.arange(3) + 0.5) * 6 / 3).astype(int), 5)
        xs = np.minimum(((np.arange(4) + 0.5) * 8 / 4).astype(int), 7)
        np.testing.assert_array_equal(got, img[ys][:, xs])

    def test_resize_validations(self, spark):
        import pytest

        from strake_spark.operators.multimodal import resize_images

        with pytest.raises(ValueError):
            resize_images(None, width=0, height=2)

    def test_decoder_handles_filtered_scanlines(self):
        """Real-world PNGs use Sub/Up/Average/Paeth filters; our encoder
        only writes filter 0, so synthesize each filter type directly
        and check the decoder reconstructs the same image."""
        import struct
        import zlib

        import numpy as np

        from strake_spark.operators.multimodal import decode_png

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
        h, w, nch = img.shape
        stride = w * nch
        for ftype in (1, 2, 3, 4):
            raw = bytearray()
            prev = np.zeros(stride, dtype=np.int64)
            for yy in range(h):
                line = img[yy].reshape(-1).astype(np.int64)
                filt = np.zeros(stride, dtype=np.int64)
                for i in range(stride):
                    a = line[i - nch] if i >= nch else 0
                    b = prev[i]
                    c = prev[i - nch] if i >= nch else 0
                    if ftype == 1:
                        pred = a
                    elif ftype == 2:
                        pred = b
                    elif ftype == 3:
                        pred = (a + b) >> 1
                    else:
                        p = a + b - c
                        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    filt[i] = (line[i] - pred) % 256
                raw += bytes([ftype]) + bytes(filt.astype(np.uint8))
                prev = line

            def chunk(tag, data):
                body = tag + data
                return (
                    struct.pack(">I", len(data))
                    + body
                    + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
                )

            png = (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(bytes(raw)))
                + chunk(b"IEND", b"")
            )
            np.testing.assert_array_equal(
                decode_png(png), img, err_msg=f"filter {ftype}"
            )

    @staticmethod
    def _png_with(ihdr_fields, idat_payload):
        import struct
        import zlib

        def chunk(tag, data):
            body = tag + data
            return (
                struct.pack(">I", len(data))
                + body
                + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
            )

        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
            + chunk(b"IDAT", idat_payload)
            + chunk(b"IEND", b"")
        )

    def test_absurd_declared_dims_hit_decode_cap(self):
        """IHDR may declare up to u32 x u32 (~16 EiB of scanlines); the
        decoder must refuse BEFORE allocating, not trust the header."""
        import zlib

        import pytest

        from strake_spark.operators.multimodal import decode_png

        png = self._png_with(
            (1_000_000_000, 1_000_000_000, 8, 2, 0, 0, 0), zlib.compress(b"")
        )
        with pytest.raises(ValueError, match="decode cap"):
            decode_png(png)

    def test_zlib_bomb_is_bounded(self):
        """A tiny IDAT that inflates ~10 MB past the declared image size
        must raise after at most `expected`+1 inflated bytes — never
        inflate the whole bomb. Declared: 2x2 gray (exp = 6 bytes);
        actual stream: 10 MiB of zeros (compresses to ~10 KB)."""
        import zlib

        import pytest

        from strake_spark.operators.multimodal import decode_png

        bomb = zlib.compress(b"\x00" * (10 * 1024 * 1024), 9)
        assert len(bomb) < 16 * 1024  # it IS a bomb
        png = self._png_with((2, 2, 8, 0, 0, 0, 0), bomb)
        with pytest.raises(ValueError, match="scanline size"):
            decode_png(png)

    def test_zero_dimension_rejected(self):
        """w=0/h=0 violates the spec AND would make the inflate cap 0,
        which zlib treats as unbounded — must be rejected at IHDR."""
        import zlib

        import pytest

        from strake_spark.operators.multimodal import decode_png

        for dims in ((0, 4), (4, 0)):
            png = self._png_with(
                (dims[0], dims[1], 8, 0, 0, 0, 0), zlib.compress(b"")
            )
            with pytest.raises(ValueError, match="zero dimension"):
                decode_png(png)

    def test_short_stream_still_loud(self):
        """The bounded path keeps the old truncation contract: an IDAT
        inflating to FEWER bytes than declared raises the same error."""
        import zlib

        import pytest

        from strake_spark.operators.multimodal import decode_png

        png = self._png_with((4, 4, 8, 2, 0, 0, 0), zlib.compress(b"\x00" * 5))
        with pytest.raises(ValueError, match="scanline size"):
            decode_png(png)


class TestBinaryFileIngestion:
    """read_binary_files: the binaryFile-source front door for media
    payloads, composing with decode_image end-to-end."""

    def test_reads_files_with_glob_and_decodes(self, spark, tmp_path):
        import numpy as np

        from strake_spark.operators.multimodal import (
            decode_image,
            encode_png,
            read_binary_files,
        )
        from pyspark.sql import functions as F

        rng = np.random.default_rng(9)
        for i in range(3):
            img = rng.integers(0, 256, size=(2 + i, 3, 3), dtype=np.uint8)
            (tmp_path / f"img_{i}.png").write_bytes(encode_png(img))
        (tmp_path / "notes.txt").write_bytes(b"not an image")

        files = read_binary_files(spark, str(tmp_path), glob="*.png")
        assert files.count() == 3  # pathGlobFilter pruned the .txt
        payloads = files.select(
            F.regexp_extract("path", r"img_(\d+)\.png", 1)
            .cast("bigint")
            .alias("doc_id"),
            F.col("content").alias("payload"),
        )
        got = decode_image(payloads).toPandas().set_index("doc_id").sort_index()
        assert list(got.height) == [2, 3, 4]
        assert (got.n_channels == 3).all()
        assert got.err.isna().all()

    def test_metadata_only_projection(self, spark, tmp_path):
        """Selecting only metadata must not read content (the source
        prunes the column — assert it is absent from the scan schema)."""
        from strake_spark.operators.multimodal import read_binary_files

        (tmp_path / "a.bin").write_bytes(b"\x00" * 128)
        meta = read_binary_files(spark, str(tmp_path)).select("path", "length")
        plan = meta._jdf.queryExecution().executedPlan().toString()
        assert "content" not in plan.split("ReadSchema:")[-1]
        row = meta.collect()[0]
        assert row.length == 128

    def test_recursive_lookup(self, spark, tmp_path):
        from strake_spark.operators.multimodal import read_binary_files

        sub = tmp_path / "nested" / "deeper"
        sub.mkdir(parents=True)
        (sub / "x.bin").write_bytes(b"abc")
        assert read_binary_files(spark, str(tmp_path), recursive=True).count() == 1


class TestWavCodec:
    """decode_wav/decode_audio: jar-free 16-bit PCM audio decode, the
    same REAL-decode discipline as the PNG codec."""

    def test_roundtrip_mono_and_stereo(self):
        import numpy as np

        from strake_spark.operators.multimodal import decode_wav, encode_wav

        rng = np.random.default_rng(13)
        for shape in [(100,), (64, 2), (7, 4)]:
            x = rng.integers(-32768, 32767, size=shape, dtype=np.int16)
            rate, got = decode_wav(encode_wav(x, sample_rate=22050))
            assert rate == 22050
            want = x if x.ndim == 2 else x[:, None]
            np.testing.assert_array_equal(got, want)

    def test_skips_metadata_chunks(self):
        import struct

        import numpy as np

        from strake_spark.operators.multimodal import decode_wav, encode_wav

        x = np.arange(10, dtype=np.int16)
        wav = bytearray(encode_wav(x, sample_rate=8000))
        # splice a LIST chunk (odd size -> exercises RIFF even-padding)
        extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
        out = wav[:12] + extra + wav[12:]
        out[4:8] = struct.pack("<I", len(out) - 8)
        rate, got = decode_wav(bytes(out))
        assert rate == 8000
        np.testing.assert_array_equal(got[:, 0], x)

    def test_rejects_non_pcm_and_garbage(self):
        import struct

        import numpy as np
        import pytest

        from strake_spark.operators.multimodal import decode_wav, encode_wav

        with pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"not audio at all")
        wav = bytearray(encode_wav(np.zeros(4, dtype=np.int16)))
        wav[20:22] = struct.pack("<H", 3)  # IEEE float format tag
        with pytest.raises(ValueError, match="16-bit PCM"):
            decode_wav(bytes(wav))

    def test_decode_audio_exact_stats(self, spark):
        import numpy as np
        import pandas as pd

        from strake_spark.operators.multimodal import decode_audio, encode_wav

        x = np.array([[3, -4], [0, 5]], dtype=np.int16)  # sum_sq = 50
        sdf = spark.createDataFrame(
            pd.DataFrame({"doc_id": [0, 1],
                          "payload": [encode_wav(x, 44100), b"junk"]})
        )
        out = decode_audio(sdf).toPandas().set_index("doc_id")
        good = out.loc[0]
        assert (good.sample_rate, good.n_channels, good.n_frames) == (44100, 2, 2)
        assert good.peak == 5 and good.sum_sq == 50
        assert good.rms == float(np.sqrt(50 / 4))
        assert out.loc[1].err is not None and pd.isna(out.loc[1].sample_rate)


class TestSyntheticWavPayloads:
    def test_stats_match_closed_form(self, spark):
        """End-to-end: synthetic WAVs through decode_audio recover the
        generator's closed-form dims and exact integer stats — the
        roundtrip the r18 oracled entry will hash against SQL."""
        import numpy as np

        from strake_spark.operators.multimodal import (
            decode_audio,
            synthetic_wav_payloads,
        )

        ids = spark.range(20).selectExpr("id as doc_id")
        out = (
            decode_audio(synthetic_wav_payloads(ids))
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        for doc_id in range(20):
            n = 8 + doc_id % 16
            i = np.arange(n)
            s = (i * 37 + doc_id * 11) % 201 - 100
            row = out.loc[doc_id]
            assert (row.sample_rate, row.n_channels, row.n_frames) == (
                8000 + 100 * (doc_id % 5), 1, n,
            )
            assert row.peak == int(np.abs(s).max())
            assert row.sum_sq == int((s * s).sum())
            assert row.err is None


class TestDecoderFuzz:
    """The `err`-column contract, generalized: for ARBITRARY bytes —
    random garbage or mutated valid payloads — the decoders raise only
    the exception types the operators catch (ValueError/TypeError/
    struct.error/zlib.error), never IndexError/MemoryError/etc. that
    would kill an executor stage instead of landing in `err`."""

    _CAUGHT = None  # set lazily to the operator's catch set

    @classmethod
    def _caught(cls):
        if cls._CAUGHT is None:
            import struct
            import zlib

            cls._CAUGHT = (ValueError, TypeError, struct.error, zlib.error)
        return cls._CAUGHT

    def test_decode_wav_arbitrary_bytes(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from strake_spark.operators.multimodal import decode_wav

        @settings(max_examples=120, deadline=None)
        @given(b=st.binary(max_size=256))
        def run(b):
            try:
                rate, frames = decode_wav(b)
                assert rate >= 0 and frames.ndim == 2
            except self._caught():
                pass

        run()

    def test_decode_wav_zero_channels_loud(self):
        # pinned hypothesis find (r19 opt round): flipping the low byte
        # of nChannels in the fmt chunk (offset 22) to 0 used to raise
        # ZeroDivisionError from the frame math instead of a loud
        # ValueError in the decoder's catch set.
        import numpy as np

        from strake_spark.operators.multimodal import decode_wav, encode_wav

        base = encode_wav(np.arange(-50, 50, dtype=np.int16), 16000)
        mutated = base[:22] + b"\x00" + base[23:]
        with pytest.raises(ValueError, match="zero channels"):
            decode_wav(mutated)

    def test_decode_wav_mutated_valid_payload(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from strake_spark.operators.multimodal import decode_wav, encode_wav

        base = encode_wav(np.arange(-50, 50, dtype=np.int16), 16000)

        @settings(max_examples=120, deadline=None)
        @given(
            pos=st.integers(0, len(base) - 1),
            val=st.integers(0, 255),
            cut=st.integers(0, len(base)),
        )
        def run(pos, val, cut):
            mutated = base[:pos] + bytes([val]) + base[pos + 1:]
            for payload in (mutated, base[:cut]):
                try:
                    rate, frames = decode_wav(payload)
                    assert rate >= 0 and frames.ndim == 2
                except self._caught():
                    pass

        run()

    def test_decode_png_arbitrary_and_mutated(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from strake_spark.operators.multimodal import decode_png, encode_png

        base = encode_png(
            np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
        )

        @settings(max_examples=120, deadline=None)
        @given(
            junk=st.binary(max_size=128),
            pos=st.integers(0, len(base) - 1),
            val=st.integers(0, 255),
            cut=st.integers(0, len(base)),
        )
        def run(junk, pos, val, cut):
            mutated = base[:pos] + bytes([val]) + base[pos + 1:]
            for payload in (junk, mutated, base[:cut]):
                try:
                    img = decode_png(payload)
                    assert img.ndim == 3
                except self._caught():
                    pass

        run()
