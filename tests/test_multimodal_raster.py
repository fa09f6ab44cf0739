"""Multimodal binary-column plumbing + raster<->vector operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rhealpixdggs_spark.kernel import cells as KC
from rhealpixdggs_spark.kernel.constants import WGS84_003
from rhealpixdggs_spark.operators.multimodal import (
    attach_payload,
    byte_features,
    decode_image,
    resize_image,
    sample_frames,
)
from rhealpixdggs_spark.operators.raster import (
    cells_to_raster,
    raster_grid,
    raster_to_cells,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "a" * 40), (2, ""), (3, "sparkly bytes here")],
        ["doc_id", "text"],
    )
    return attach_payload(docs)


class TestMultimodal:
    def test_schema(self, media):
        assert dict(media.dtypes)["payload"] == "binary"
        assert "struct" in dict(media.dtypes)["meta"]

    def test_byte_features_exact(self, media):
        rows = {r.doc_id: r for r in byte_features(media).collect()}
        b = b"hello world"
        assert rows[0].n_bytes == len(b)
        assert rows[0].first_byte == b[0]
        assert rows[0].mean_byte == pytest.approx(sum(b) / len(b))
        assert sum(rows[0].hist16) == len(b)
        assert rows[2].n_bytes == 0 and rows[2].first_byte == -1

    def test_frame_sampling(self, media):
        out = sample_frames(media, frame_size=16, every_k=3).collect()
        d1 = sorted(
            [r for r in out if r.doc_id == 1], key=lambda r: r.frame_idx
        )
        # 40 bytes -> frames 0,1,2 -> keep 0 only (every 3rd).
        assert [r.frame_idx for r in d1] == [0]
        assert d1[0].frame_len == 16
        assert d1[0].frame_sum == 16 * ord("a")
        assert bytes(d1[0].frame) == b"a" * 16

    def test_vectorized_matches_scalar_reference(self, spark):
        # ragged batch incl. empty, 1-byte, multi-byte UTF-8 and long
        # payloads: the offsets-vectorized path must equal a plain
        # per-row Python computation byte-for-byte.
        texts = ["", "x", "héllo wörld — ünïcode", "ab" * 37, "ÿ" * 5, "z" * 100]
        docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
        media = attach_payload(docs)
        rows = {r.doc_id: r for r in byte_features(media).collect()}
        frames = {}
        for r in sample_frames(media, frame_size=7, every_k=2).collect():
            frames.setdefault(r.doc_id, []).append(r)
        for i, t in enumerate(texts):
            b = t.encode("utf-8")
            assert rows[i].n_bytes == len(b)
            assert rows[i].first_byte == (b[0] if b else -1)
            assert rows[i].mean_byte == pytest.approx(
                sum(b) / len(b) if b else 0.0
            )
            exp_hist = [0] * 16
            for byte in b:
                exp_hist[byte >> 4] += 1
            assert list(rows[i].hist16) == exp_hist
            exp_frames = []
            n_frames = (len(b) + 6) // 7
            for fi in range(0, n_frames, 2):
                fr = b[fi * 7 : (fi + 1) * 7]
                exp_frames.append((fi, len(fr), sum(fr), fr))
            got = sorted(
                (r.frame_idx, r.frame_len, r.frame_sum, bytes(r.frame))
                for r in frames.get(i, [])
            )
            assert got == exp_frames, (i, t)

    def test_fake_decode_deterministic(self, media):
        out = {r.doc_id: r for r in decode_image(media).collect()}
        r = out[0]
        assert r.decoded_by == "fake"
        b = np.frombuffer(b"hello world", dtype=np.uint8)
        px = np.resize(b, (r.height, r.width))
        assert r.mean_px == pytest.approx(float(px.mean()))

    def test_resize_non_ppm_is_marked_stub(self, media):
        # `media` payloads are raw UTF-8 text, not PPM: the real
        # codec would need PIL, so the declared stub must raise.
        with pytest.raises(Exception) as e:
            resize_image(media, 8, 8).collect()
        assert "NotImplementedError" in str(e.value) or isinstance(
            e.value, NotImplementedError
        )

    def test_resize_ppm_nearest_neighbor(self):
        from rhealpixdggs_spark.operators.multimodal import (
            encode_ppm,
            parse_ppm,
            resize_ppm,
        )

        d = 123
        sw, sh = d % 64 + 1, d % 48 + 1
        buf = encode_ppm([d], [sw], [sh])[0]
        out = resize_ppm(buf, 8, 6)
        pw, ph, px = parse_ppm(out)
        assert (pw, ph) == (8, 6) and px.size == 144
        src = parse_ppm(buf)[2].reshape(sh, sw, 3)
        exp = src[(np.arange(6) * sh) // 6][:, (np.arange(8) * sw) // 8]
        assert np.array_equal(px.reshape(6, 8, 3), exp)
        # identity resize reproduces the source pixels
        same = resize_ppm(buf, sw, sh)
        assert np.array_equal(parse_ppm(same)[2], parse_ppm(buf)[2])
        assert resize_ppm(b"not an image", 4, 4) is None

    def test_parse_ppm_roundtrip_with_comments(self):
        from rhealpixdggs_spark.operators.multimodal import encode_ppm, parse_ppm

        for d in (0, 5, 7, 123, 4999):  # d%5==0 rows carry a comment
            w, h = d % 64 + 1, d % 48 + 1
            buf = encode_ppm([d], [w], [h])[0]
            pw, ph, px = parse_ppm(buf)
            assert (pw, ph) == (w, h)
            exp = (d * 31 + 7 * np.arange(w * h * 3, dtype=np.int64)) % 256
            assert np.array_equal(px, exp.astype(np.uint8))

    def test_parse_ppm_rejects_and_guards(self):
        from rhealpixdggs_spark.operators.multimodal import parse_ppm

        assert parse_ppm(b"notppm") is None
        assert parse_ppm(b"") is None
        # ADVICE r4: malformed 'P6'-prefixed buffers must fall through
        # (return None) so one corrupt payload can't fail a whole
        # Arrow batch — they route to the caller's next decoder.
        assert parse_ppm(b"P6\n# only a comment") is None  # truncated header
        assert parse_ppm(b"P6\n2 2\n65535\n" + b"\0" * 24) is None  # 16-bit
        assert parse_ppm(b"P6\n2 x\n255\n" + b"\0" * 12) is None  # garbled dim
        assert parse_ppm(b"P6\n2 2\n255\n" + b"\0" * 5) is None  # short pixels
        assert parse_ppm(b"P6\n0 2\n255\n") is None  # degenerate dims
        # Arbitrary whitespace runs and multiple comments are legal.
        pw, ph, px = parse_ppm(b"P6\n#a\n  \t2\n#b\n 1  255\n" + bytes(range(6)))
        assert (pw, ph) == (2, 1) and list(px) == [0, 1, 2, 3, 4, 5]

    def test_real_ppm_decode_in_spark(self, spark):
        from rhealpixdggs_spark.operators.multimodal import (
            attach_ppm_payload,
            decode_image,
        )

        docs = spark.createDataFrame(
            [(i, "t") for i in (0, 3, 10, 77)], "doc_id long, text string"
        )
        out = {r.doc_id: r for r in decode_image(attach_ppm_payload(docs)).collect()}
        for d in (0, 3, 10, 77):
            r = out[d]
            assert r.decoded_by == "ppm"
            assert (r.width, r.height) == (d % 64 + 1, d % 48 + 1)
            n = r.width * r.height * 3
            exp = ((d * 31 + 7 * np.arange(n, dtype=np.int64)) % 256)
            assert r.mean_px == int(exp.sum()) / n


class TestRaster:
    def test_grid_pixel_centers(self, spark):
        g = raster_grid(spark, 144, 72)
        assert g.count() == 144 * 72
        r0 = g.where(F.col("pixel_id") == 0).first()
        assert r0.lon == -180.0 + 1.25 and r0.lat == 90.0 - 1.25

    def test_raster_to_cells_partitions_all_pixels(self, spark):
        g = raster_grid(spark, 144, 72)
        agg = raster_to_cells(g, res=1)
        rows = agg.collect()
        assert sum(r.n_pixels for r in rows) == 144 * 72  # no pixel lost
        assert all(len(r.cell_id) == 2 for r in rows)

    def test_raster_roundtrip_against_kernel(self, spark):
        g = raster_grid(spark, 144, 72).where(F.col("pixel_id") < 500)
        agg = {r.cell_id: r.n_pixels for r in raster_to_cells(g, res=1).collect()}
        lon = np.array([-180.0 + (c * 2 + 1) * 1.25 for c in range(144)])[
            np.arange(500) % 144
        ]
        lat = np.array([90.0 - (r * 2 + 1) * 1.25 for r in range(4)])[
            np.arange(500) // 144
        ]
        kern = KC.encode(WGS84_003, lon, lat, 1, plane=False)
        import collections

        exp = collections.Counter(kern)
        assert agg == dict(exp)

    def test_cells_to_raster_paints_only_selected(self, spark):
        g = raster_grid(spark, 144, 72)
        tiles = spark.createDataFrame([("N4",), ("O0",)], ["cell_id"])
        out = cells_to_raster(g, tiles, res=1)
        got = set(r.cell_id for r in out.select("cell_id").distinct().collect())
        assert got == {"N4", "O0"}
        # painted pixel count equals the per-cell pixel census
        census = {
            r.cell_id: r.n_pixels
            for r in raster_to_cells(g, res=1).collect()
            if r.cell_id in got
        }
        assert out.count() == sum(census.values())
