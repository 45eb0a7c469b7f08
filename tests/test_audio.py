"""WAV codec + audio feature stage: roundtrips across bit depths,
planted-sine RMS/ZCR physics, stereo downmix, error rows, and the
framing plan's window-count algebra."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from medical_and_charity_document_extraction_system_ray.pipelines.multimodal import (
    AudioFeatureExtractor,
    extract_audio_features,
)
from medical_and_charity_document_extraction_system_ray.sources.wavcodec import (
    frame_signal,
    wav_decode,
    wav_encode,
)


def _sine(freq, sr, secs, amp=0.5):
    t = np.arange(int(sr * secs)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_wav_roundtrip_mono_and_stereo():
    sr = 16000
    mono = _sine(440, sr, 0.2)
    x, rate = wav_decode(wav_encode(mono, sr))
    assert rate == sr and x.shape == mono.shape
    assert np.abs(x - mono).max() < 2 / 32768
    st = np.stack([mono, -mono], axis=1)
    x2, _ = wav_decode(wav_encode(st, sr))
    assert x2.shape == st.shape
    assert np.abs(x2 - st).max() < 2 / 32768


def test_wav_8_24_32_bit_and_float_decode():
    import struct

    sr = 8000
    mono = _sine(100, sr, 0.05, amp=0.25)
    # float32 variant: rewrite fmt + data by hand
    fmt = struct.pack("<HHIIHH", 3, 1, sr, sr * 4, 4, 32)
    body = mono.astype("<f4").tobytes()
    data = b"".join([
        b"RIFF", struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body)), b"WAVE",
        b"fmt ", struct.pack("<I", len(fmt)), fmt,
        b"data", struct.pack("<I", len(body)), body,
    ])
    x, rate = wav_decode(data)
    assert rate == sr and np.abs(x - mono).max() < 1e-6
    # 8-bit unsigned
    pcm8 = np.clip(np.round(mono * 128 + 128), 0, 255).astype(np.uint8)
    fmt8 = struct.pack("<HHIIHH", 1, 1, sr, sr, 1, 8)
    data8 = b"".join([
        b"RIFF", struct.pack("<I", 4 + 8 + len(fmt8) + 8 + pcm8.size), b"WAVE",
        b"fmt ", struct.pack("<I", len(fmt8)), fmt8,
        b"data", struct.pack("<I", pcm8.size), pcm8.tobytes(),
    ])
    x8, _ = wav_decode(data8)
    assert np.abs(x8 - mono).max() < 1 / 64


def test_frame_signal_shapes():
    x = np.arange(100, dtype=np.float32)
    fr = frame_signal(x, 25, 10)
    assert fr.shape == (8, 25)  # 1 + (100-25)//10
    np.testing.assert_array_equal(fr[1], x[10:35])
    assert frame_signal(x[:10], 25, 10).shape == (0, 25)


def test_sine_rms_and_zcr_physics(tmp_path):
    """A 440 Hz sine at amplitude a: frame RMS ~ a/sqrt(2); zero
    crossings per sample ~ 2f/sr."""
    sr, amp, freq = 16000, 0.5, 440
    p = tmp_path / "tone.wav"
    p.write_bytes(wav_encode(_sine(freq, sr, 1.0, amp), sr))
    out = AudioFeatureExtractor()(pa.table({"audio_ref": [str(p)]})).to_pylist()[0]
    assert out["error"] == ""
    assert out["sample_rate"] == sr and out["n_samples"] == sr
    assert abs(out["rms_mean"] - amp / np.sqrt(2)) < 0.01
    assert abs(out["zcr_mean"] - 2 * freq / sr) < 0.01


def test_audio_stage_stereo_downmix_and_error_rows(tmp_path):
    sr = 8000
    left = _sine(200, sr, 0.3, 0.4)
    st = np.stack([left, left], axis=1)  # identical channels -> same RMS
    good = tmp_path / "st.wav"
    good.write_bytes(wav_encode(st, sr))
    bad = tmp_path / "missing.wav"
    ds = ray.data.from_arrow(
        pa.table({"audio_ref": [str(good), str(bad)]})
    )
    rows = {
        r["audio_ref"]: r
        for r in extract_audio_features(ds, concurrency=1).to_pandas().to_dict("records")
    }
    g = rows[str(good)]
    assert g["error"] == "" and abs(g["rms_mean"] - 0.4 / np.sqrt(2)) < 0.01
    b = rows[str(bad)]
    assert b["error"].startswith("FileNotFoundError") and b["n_windows"] == 0


def test_audio_window_plan_counts(tmp_path):
    import pyarrow.parquet as pq

    from medical_and_charity_document_extraction_system_ray.pipelines.multimodal import (
        q_audio_window_plan,
    )

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["a", "b", "c"]),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["t"] * 3),
                "n_chars": pa.array([1, 2, 100], pa.int64()),  # 10/20/1000 ms
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = q_audio_window_plan(str(tmp_path)).to_pandas()
    # 10ms clip: no full 25ms window; 20ms: none; 1000ms: (1000-25)//10+1=98
    assert len(df[df.doc_id == 1]) == 0
    assert len(df[df.doc_id == 2]) == 0
    assert len(df[df.doc_id == 3]) == 98
    w = df[df.doc_id == 3]
    assert w.start_ms.max() == 970  # last window fits: 970+25 <= 1000


def test_audio_fingerprint_perturbation_and_planted(tmp_path):
    """Signature invariants through the real WAV path: identical text ->
    identical signature; one changed char -> small hamming; unrelated
    text -> far.  Pipeline finds the planted exact pair at hamming 0."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from medical_and_charity_document_extraction_system_ray.pipelines.multimodal import (
        AudioFingerprinter,
        q_audio_fingerprint_check,
        q_audio_fingerprint_neardup,
    )

    base = "the quick brown fox jumps over the lazy dog " * 4
    pert = base[:-2] + "x "                      # one char changed
    other = "zzz completely different signal content qqq " * 4
    fp = AudioFingerprinter()
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": pa.array([base, base, pert, other])})
    out = fp(t)
    sig = out["sig"].to_pylist()
    assert sig[0] == sig[1]
    ham_near = bin(sig[0] ^ sig[2]).count("1")
    ham_far = bin(sig[0] ^ sig[3]).count("1")
    assert ham_near <= 6
    assert ham_far > 10

    pq.write_table(t, str(tmp_path / "documents.parquet"))
    pairs = q_audio_fingerprint_neardup(str(tmp_path)).to_pandas()
    z = set(zip(pairs["doc_a"], pairs["doc_b"], pairs["hamming"]))
    assert (0, 1, 0) in z
    chk = q_audio_fingerprint_check(str(tmp_path)).to_pandas()
    assert int(chk["n_exact_dup_pairs"][0]) == 1
    assert bool(chk["exact_dups_found"][0])
