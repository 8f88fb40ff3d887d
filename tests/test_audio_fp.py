"""Audio fingerprinting (ops/multimodal.audio_fingerprint*)."""

import numpy as np

from schema_fantasy_spark.ops.multimodal import (
    audio_fingerprint64,
    audio_fingerprints,
    encode_wav_pcm16,
)


def _square(frame_amps, k=8):
    """Square-ish signal: k samples per frame alternating +/-amp."""
    out = []
    for a in frame_amps:
        for s in range(k):
            out.append(a if s % 2 == 0 else -a)
    return np.array(out, dtype=np.int16)


def test_fingerprint_bits_and_shift_invariance():
    amps = [20000 if j % 3 == 0 else 500 for j in range(64)]
    fp = audio_fingerprint64(_square(amps))
    for j in range(63):
        assert ((fp >> j) & 1) == (1 if j % 3 == 0 else 0)
    # uniform amplitude offset leaves the mean-threshold bits alone
    fp2 = audio_fingerprint64(_square([a + 150 for a in amps]))
    assert fp2 == fp
    assert audio_fingerprint64(np.array([], dtype=np.int16)) == 0


def test_audio_fingerprints_spark_and_neardup(spark):
    from schema_fantasy_spark.ops.dedup import hamming_near_duplicates

    def wav(group, noise):
        amps = [(20000 if (group >> (j % 13)) & 1 else 500) + noise
                for j in range(64)]
        return encode_wav_pcm16(_square(amps), rate=8000)

    rows = [
        (1, wav(0x1001, 0)), (2, wav(0x1001, 70)),   # same group, noisy
        (3, wav(0x1FFE, 0)),                          # different pattern
        (4, b"not a wav"),                            # quarantined
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = audio_fingerprints(df, binary_col="payload", id_col="doc_id")
    got = {r.doc_id: r.afp for r in fps.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == got[2] != got[3]
    pairs = hamming_near_duplicates(fps, "afp", max_hamming=3).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(1, 2, 0)]
