"""Bit-for-bit verification of the REAL multimodal codec tier (PPM
decode/resize via numpy, WAV decode via stdlib wave) against
pure-python re-decodes computed without Spark."""

import hashlib
import io
import wave

import numpy as np


def _doc_texts(spark, sf_dir, n=20):
    from kafkaish_spark.sources.tables import load_table

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    )
    return {r.doc_id: r.text for r in rows}


def test_ppm_payloads_are_spec_valid_and_decode_matches(spark, sf_dir):
    from kafkaish_spark.operators.multimodal import (
        decode_ppm,
        make_ppm,
        q_multimodal_ppm_decode,
        resize_nn,
    )

    texts = _doc_texts(spark, sf_dir)
    got = {
        r.doc_id: r
        for r in q_multimodal_ppm_decode(spark, sf_dir).collect()
        if r.doc_id in texts
    }
    assert set(got) == set(texts)
    for did, text in texts.items():
        seed = hashlib.sha256(text.encode()).digest()
        payload = make_ppm(did, seed)
        # spec-valid header
        assert payload.startswith(b"P6\n")
        img = decode_ppm(payload)
        r = got[did]
        assert (r.height, r.width) == img.shape[:2]
        sums = img.astype(np.int64).sum(axis=(0, 1))
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(int(s) for s in sums)
        thumb = resize_nn(img, 32)
        assert (r.out_h, r.out_w) == thumb.shape[:2]
        assert r.thumb_sha == hashlib.sha256(thumb.tobytes()).hexdigest()
        assert max(r.out_h, r.out_w) <= 32


def test_ppm_resize_preserves_aspect_and_pixels_come_from_source(spark, sf_dir):
    from kafkaish_spark.operators.multimodal import decode_ppm, make_ppm, resize_nn

    seed = hashlib.sha256(b"fixed").digest()
    img = decode_ppm(make_ppm(1, seed))
    thumb = resize_nn(img, 8)
    # every thumb pixel exists in the source image (nearest neighbor)
    src = {tuple(px) for row in img for px in row}
    for row in thumb:
        for px in row:
            assert tuple(px) in src


def test_wav_payloads_open_with_stdlib_and_features_match(spark, sf_dir):
    from kafkaish_spark.operators.multimodal import (
        make_wav,
        q_multimodal_wav_features,
    )

    texts = _doc_texts(spark, sf_dir, n=10)
    got = {}
    for r in q_multimodal_wav_features(spark, sf_dir).collect():
        if r.doc_id in texts:
            got.setdefault(r.doc_id, {})[r.frame_idx] = r
    assert set(got) == set(texts)
    for did, text in texts.items():
        seed = hashlib.sha256(text.encode()).digest()
        payload = make_wav(did, seed)
        with wave.open(io.BytesIO(payload), "rb") as wf:
            assert wf.getnchannels() == 1
            assert wf.getsampwidth() == 2
            rate = wf.getframerate()
            n = wf.getnframes()
            pcm = np.frombuffer(wf.readframes(n), dtype="<i2").astype(np.int64)
        frames = got[did]
        assert len(frames) == (len(pcm) + 199) // 200
        for fi, row in frames.items():
            fr = pcm[fi * 200 : fi * 200 + 200]
            assert row.rate == rate
            assert row.n_samples == n
            assert row.duration_ms == n * 1000 // rate
            assert row.energy == int(np.abs(fr).sum())
            assert row.peak == int(np.abs(fr).max())
            assert row.zero_crossings == int(
                (np.signbit(fr[:-1]) != np.signbit(fr[1:])).sum()
            )


import pytest as _pytest

from kafkaish_spark.operators.multimodal import HAS_PIL, PIL_BOOTSTRAP


@_pytest.mark.skipif(not HAS_PIL, reason=f"PIL absent; {PIL_BOOTSTRAP}")
def test_pil_resize_real_matches_own_decoder(spark, sf_dir):
    """When PIL is present, the gated real tier must agree with the
    repo's own P6 decoder on every image's source dimensions and
    target-box math."""
    from kafkaish_spark.operators.multimodal import (
        decode_ppm,
        pil_resize_batches,
        ppm_media_table,
        PIL_RESIZED_SCHEMA,
    )

    media = ppm_media_table(spark, sf_dir).limit(50)
    got = {
        r["doc_id"]: r
        for r in media.mapInPandas(
            pil_resize_batches(32), PIL_RESIZED_SCHEMA
        ).collect()
    }
    for r in media.collect():
        img = decode_ppm(bytes(r["payload"]))
        g = got[r["doc_id"]]
        assert (g["height"], g["width"]) == img.shape[:2]
        scale = 32 / max(g["width"], g["height"])
        assert g["out_w"] == max(1, round(g["width"] * scale))
        assert g["out_h"] == max(1, round(g["height"] * scale))
        assert len(g["thumb_sha"]) == 64


def test_wav_resample_bit_exact_and_length_law(spark, sf_dir):
    """The distributed resample must equal a pure-python replay
    byte-for-byte, and output length must follow
    n_out == round(n_in * out/in)."""
    import hashlib
    import io
    import wave

    import numpy as np

    from kafkaish_spark.operators.multimodal import (
        RESAMPLE_SCHEMA,
        resample_pcm16,
        wav_media_table,
        wav_resample_batches,
    )

    media = wav_media_table(spark, sf_dir).limit(40)
    got = {
        r["doc_id"]: r
        for r in media.mapInPandas(
            wav_resample_batches(4000), RESAMPLE_SCHEMA
        ).collect()
    }
    for r in media.collect():
        b = bytes(r["payload"])
        rb = resample_pcm16(b, 4000)  # pure-python replay
        g = got[r["doc_id"]]
        assert g["out_sha"] == hashlib.sha256(rb).hexdigest()
        assert g["n_out"] == round(g["n_in"] * 4000 / g["in_rate"])
        with wave.open(io.BytesIO(rb), "rb") as wf:
            assert wf.getframerate() == 4000
            q = np.frombuffer(wf.readframes(wf.getnframes()), dtype="<i2")
        # amplitude envelope preserved by interpolation
        src = np.frombuffer(
            wave.open(io.BytesIO(b), "rb").readframes(g["n_in"]), dtype="<i2"
        )
        assert abs(int(np.abs(q).max()) - int(np.abs(src).max())) <= 50


def test_ppm_patches_bit_exact_replay(spark, sf_dir):
    """ViT-style patching replayed in pure numpy: grid shape, exact
    per-patch range stats, and the patch-tensor sha must all match —
    the sha pins the exact row-major tiling layout (a transposed or
    off-by-one tiling changes it)."""
    from kafkaish_spark.operators.multimodal import (
        decode_ppm,
        make_ppm,
        q_multimodal_ppm_patches,
        resize_nn,
    )

    texts = _doc_texts(spark, sf_dir)
    got = {
        r.doc_id: r
        for r in q_multimodal_ppm_patches(spark, sf_dir).collect()
        if r.doc_id in texts
    }
    assert set(got) == set(texts)
    patch = 8
    for did, text in texts.items():
        seed = hashlib.sha256(text.encode()).digest()
        img = resize_nn(decode_ppm(make_ppm(did, seed)), 32)
        gh, gw = img.shape[0] // patch, img.shape[1] // patch
        crop = img[: gh * patch, : gw * patch]
        tiles = crop.reshape(gh, patch, gw, patch, 3).swapaxes(1, 2)
        flat = tiles.reshape(gh * gw, -1).astype(np.int64)
        rng = flat.max(axis=1) - flat.min(axis=1)
        r = got[did]
        assert (r.grid_h, r.grid_w, r.n_patches) == (gh, gw, gh * gw)
        assert r.mean_patch_range == int(rng.sum()) // (gh * gw)
        assert r.max_patch_range == int(rng.max())
        assert r.patches_sha == hashlib.sha256(
            tiles.astype(np.uint8).tobytes()
        ).hexdigest()
        # the resize target bounds the grid
        assert 1 <= gh <= 4 and 1 <= gw <= 4


def test_ppm_augment_bit_exact_and_invariants(spark, sf_dir):
    """All three augmentation variants replayed in numpy: hashes match
    bit-for-bit, channel sums are permutation-invariant across
    variants, and the three variant hashes are pairwise distinct for
    non-degenerate images."""
    from kafkaish_spark.operators.multimodal import (
        decode_ppm,
        make_ppm,
        q_multimodal_ppm_augment,
        resize_nn,
    )

    texts = _doc_texts(spark, sf_dir, n=10)
    rows = [
        r
        for r in q_multimodal_ppm_augment(spark, sf_dir).collect()
        if r.doc_id in texts
    ]
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.aug] = r
    assert set(by_doc) == set(texts)
    for did, text in texts.items():
        seed = hashlib.sha256(text.encode()).digest()
        base = resize_nn(decode_ppm(make_ppm(did, seed)), 32)
        variants = {
            "id": base,
            "hflip": base[:, ::-1],
            "rot90": np.rot90(base),
        }
        got = by_doc[did]
        assert set(got) == set(variants)
        sums = {
            aug: tuple(
                int(s) for s in img.astype(np.int64).sum(axis=(0, 1))
            )
            for aug, img in variants.items()
        }
        # permutation invariance: all variants share the channel sums
        assert len(set(sums.values())) == 1
        for aug, img in variants.items():
            r = got[aug]
            assert (r.height, r.width) == img.shape[:2]
            assert (r.sum_r, r.sum_g, r.sum_b) == sums[aug]
            assert r.aug_sha == hashlib.sha256(
                np.ascontiguousarray(img).tobytes()
            ).hexdigest()
        # rot90 swaps dims for non-square, and hashes must differ
        shas = {got[a].aug_sha for a in variants}
        assert len(shas) == 3
