"""Native C++ kernels vs their pure-python reference implementations."""

import numpy as np
import pytest

from semi_tts_tpu import native
from semi_tts_tpu.data import wavio
from semi_tts_tpu.utils.metrics import edit_distance


@pytest.fixture(scope="module")
def built():
    so = native.build()
    if so is None or native.lib() is None:
        pytest.skip("no g++ toolchain")
    return so


def test_wav_batch_decode_matches_python(built, tmp_path):
    rng = np.random.RandomState(0)
    paths = []
    refs = []
    for i, (subtype, L) in enumerate([("PCM_16", 12345), ("FLOAT", 4001), ("PCM_16", 30011)]):
        w = (rng.randn(L) * 0.4).clip(-1, 1).astype(np.float32)
        p = tmp_path / f"t{i}.wav"
        wavio.write(str(p), w, 22050, subtype=subtype)
        paths.append(str(p))
        refs.append(wavio.read(str(p))[0][0])
    arr, lens, srs = native.wav_read_batch(paths, 40000, n_threads=3)
    for i, ref in enumerate(refs):
        assert lens[i] == len(ref)
        assert srs[i] == 22050
        np.testing.assert_allclose(arr[i, : lens[i]], ref, atol=1e-6)


def test_wav_batch_decode_failure_row(built, tmp_path):
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav file at all")
    ok = tmp_path / "ok.wav"
    wavio.write(str(ok), np.zeros(100, np.float32), 22050)
    arr, lens, srs = native.wav_read_batch([str(bad), str(ok)], 1000)
    assert lens[0] == -1 and lens[1] == 100


def test_edit_distance_matches_pure_python(built):
    rng = np.random.RandomState(1)
    for _ in range(20):
        a = rng.randint(0, 10, rng.randint(0, 15)).tolist()
        b = rng.randint(0, 10, rng.randint(0, 15)).tolist()
        want = _pure_levenshtein(a, b)
        assert native.edit_distance(a, b) == want
        assert edit_distance(a, b) == want


def _pure_levenshtein(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        dp[i][0] = i
    for j in range(len(b) + 1):
        dp[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                           dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return dp[len(a)][len(b)]
