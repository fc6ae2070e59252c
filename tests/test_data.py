"""Data layer: text codec, WAV I/O, corpus tables, bucketed loader."""

import json

import numpy as np
import pytest

from helpers import REPO, make_synthetic_corpus
from semi_tts_tpu.data import wavio
from semi_tts_tpu.data.corpus import VCTKDataset, create_dataset
from semi_tts_tpu.data.loader import TTSLoader, infinite
from semi_tts_tpu.data.text import PhoneTextEncoder, load_text_encoder


def test_text_encoder_vocab_and_encode():
    enc = PhoneTextEncoder.load_from_file(f"{REPO}/data/cmu_phn.vocab")
    assert enc.vocab_size == 43  # 3 specials + 40 (`SURVEY.md`)
    assert enc.pad_idx == 0 and enc.space_idx == 1 and enc.eos_idx == 2
    ids = enc.encode("hh ah  l ow")
    # '' between double spaces -> <space>; trailing <pad> appended (src/text.py:65)
    assert ids[-1] == 0
    assert enc.idx_to_vocab(ids[0]) == "hh"
    assert 1 in ids
    assert enc.decode([3, 1, 4]).split(" ")[1] == "<space>"


def test_wavio_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    w = (rng.randn(2, 5000) * 0.3).clip(-1, 1).astype(np.float32)
    for subtype, atol in [("PCM_16", 1e-4), ("FLOAT", 1e-7)]:
        p = tmp_path / f"x_{subtype}.wav"
        wavio.write(str(p), w, 22050, subtype=subtype)
        back, sr = wavio.read(str(p))
        assert sr == 22050 and back.shape == w.shape
        np.testing.assert_allclose(back, w, atol=atol)
    assert abs(wavio.duration(str(tmp_path / "x_FLOAT.wav")) - 5000 / 22050) < 1e-6


def test_corpus_splits_and_sorting(tmp_path):
    corpus = make_synthetic_corpus(str(tmp_path))
    up, pr, dv, ts, msg = create_dataset(**corpus, inference_stage=True)
    assert len(pr) == 4 and len(up) == 4 and len(dv) == 2 and len(ts) == 2
    # sorted by duration descending (`corpus/vctk.py:33`)
    durs = pr.table.duration.tolist()
    assert durs == sorted(durs, reverse=True)
    path, sid = pr[0]
    assert path.endswith(".wav") and isinstance(sid, (int, np.integer))
    assert "size = 4" in pr.get_statics()


def test_test_split_drops_lj_speaker(tmp_path):
    corpus = make_synthetic_corpus(str(tmp_path))
    # mark one test row as the 'lj' speaker
    import pandas as pd

    t = pd.read_csv(corpus["partition_table"], index_col=0)
    spkr_map = json.load(open(corpus["spkr_map"]))
    ds_before = VCTKDataset(corpus["path"], corpus["partition_table"], "test",
                            False, 2, corpus["spkr_map"])
    assert (ds_before.table.speaker != spkr_map["lj"]).all()


def test_loader_batches_and_bucketing(tmp_path):
    corpus = make_synthetic_corpus(str(tmp_path))
    tok = load_text_encoder("phoneme", corpus["vocab_file"], corpus["map_table"])
    ds = VCTKDataset(corpus["path"], corpus["partition_table"], "paired",
                     False, 2, corpus["spkr_map"])
    loader = TTSLoader(ds, tok, shuffle=True, drop_last=True, seed=0)
    batches = list(loader)
    assert len(batches) == len(loader) == 2
    b = batches[0]
    assert b.waves.shape[0] == 2 and b.waves.dtype == np.float32
    assert b.waves.shape[1] in loader.bucket_samples
    # sorted by length desc within batch (`src/data.py:130`)
    assert b.wave_len[0] >= b.wave_len[1]
    assert (b.text[np.arange(2), b.text_len - 1] == 0).all()  # trailing pad token
    assert len(b.fids) == 2

    # bucketing=True: each index yields a bucket of similar-duration items
    ds2 = VCTKDataset(corpus["path"], corpus["partition_table"], "paired",
                      True, 2, corpus["spkr_map"])
    assert ds2.bs_for_collate == 1
    loader2 = TTSLoader(ds2, tok, shuffle=False, drop_last=False, seed=0)
    b2 = next(iter(loader2))
    assert b2.waves.shape[0] == 2  # one bucket of batch_size items

    # infinite cycling
    it = infinite(loader)
    seen = [next(it) for _ in range(5)]
    assert len(seen) == 5


def test_infinite_raises_on_empty_loader(tmp_path):
    """Split smaller than batch_size + drop_last=True yields zero batches;
    infinite() must raise, not livelock re-creating empty epochs (the
    reference's re-create loop, `bin/train_vqvae.py:34-42`, spins forever)."""
    corpus = make_synthetic_corpus(str(tmp_path))  # paired split has 4 items
    tok = load_text_encoder("phoneme", corpus["vocab_file"], corpus["map_table"])
    ds = VCTKDataset(corpus["path"], corpus["partition_table"], "paired",
                     False, 8, corpus["spkr_map"])
    loader = TTSLoader(ds, tok, shuffle=True, drop_last=True, seed=0)
    assert list(loader) == []
    with pytest.raises(RuntimeError, match="no batches"):
        next(infinite(loader))


def test_loader_prefetch_error_propagates(tmp_path):
    corpus = make_synthetic_corpus(str(tmp_path))
    tok = load_text_encoder("phoneme", corpus["vocab_file"], corpus["map_table"])
    ds = VCTKDataset(corpus["path"], corpus["partition_table"], "paired",
                     False, 2, corpus["spkr_map"])
    loader = TTSLoader(ds, tok, shuffle=False, drop_last=True, seed=0, sample_rate=16000)
    with pytest.raises(AssertionError, match="Sample rate"):
        list(loader)


def test_loader_multihost_sharding(tmp_path):
    corpus = make_synthetic_corpus(str(tmp_path))
    tok = load_text_encoder("phoneme", corpus["vocab_file"], corpus["map_table"])
    ds = VCTKDataset(corpus["path"], corpus["partition_table"], "paired",
                     False, 2, corpus["spkr_map"])
    all_b = [b.fids for b in TTSLoader(ds, tok, shuffle=False, drop_last=True, seed=0)]
    s0 = [b.fids for b in TTSLoader(ds, tok, shuffle=False, drop_last=True, seed=0,
                                    shard_id=0, num_shards=2)]
    s1 = [b.fids for b in TTSLoader(ds, tok, shuffle=False, drop_last=True, seed=0,
                                    shard_id=1, num_shards=2)]
    assert s0 + s1 == all_b  # interleaved, disjoint, complete


def test_conditioned_corpus_renders_transcripts(tmp_path):
    """`make_conditioned_corpus` audio is a deterministic rendering of its
    transcript (the learnable-mapping fixture behind tools/cycle_check.py):
    same phones -> same waveform; different phones -> different acoustics;
    duration tracks transcript length."""
    from helpers import phone_acoustics, synthesize_from_phonemes

    a = synthesize_from_phonemes(["aa", "iy", "s"], seed=3)
    b = synthesize_from_phonemes(["aa", "iy", "s"], seed=3)
    np.testing.assert_array_equal(a, b)
    c = synthesize_from_phonemes(["uw", "sh", "eh"], seed=3)
    assert a.shape != c.shape or not np.allclose(a, c)
    # phone classes map to distinct acoustics (vowel -> formants, fric -> noise)
    kind_a, prm_a = phone_acoustics("aa")
    kind_s, prm_s = phone_acoustics("s")
    assert kind_a == "voiced" and kind_s == "noise"
    assert phone_acoustics("aa") == phone_acoustics("aa")
    long = synthesize_from_phonemes(["aa"] * 10, seed=0)
    short = synthesize_from_phonemes(["aa"] * 3, seed=0)
    assert len(long) > 2 * len(short)

    from helpers import make_conditioned_corpus

    corpus = make_conditioned_corpus(str(tmp_path), n_per_split=(4, 6, 2, 2))
    up, pr, dv, ts, _ = create_dataset(**corpus, inference_stage=True)
    assert len(pr) == 4 and len(up) == 6 and len(dv) == 2


def test_conditioned_corpus_pinned_shapes(tmp_path):
    """``utt_phones=(9, 10)`` (tools/cycle_check.py --pin-shapes) collapses
    the corpus to ONE loader shape: every utterance has exactly 9 phones, so
    all waves land in a single length bucket and all text pads to a single
    quantum — each compiled step variant then traces exactly once (the
    recompile-per-shape blowup is what made low-resource cycle runs
    unaffordable over the axon tunnel)."""
    from helpers import make_conditioned_corpus

    corpus = make_conditioned_corpus(str(tmp_path), n_per_split=(4, 6, 2, 2),
                                     utt_phones=(9, 10), batch_size=2)
    tok = load_text_encoder("phoneme", corpus["vocab_file"], corpus["map_table"])
    shapes = set()
    for split in ("paired", "unpaired", "dev"):
        ds = VCTKDataset(corpus["path"], corpus["partition_table"], split,
                         False, 2, corpus["spkr_map"])
        for b in TTSLoader(ds, tok, shuffle=False, drop_last=True, seed=0):
            shapes.add((b.waves.shape[1], b.text.shape[1]))
    assert len(shapes) == 1, shapes


def test_load_dataset_wires_multihost_shards(tmp_path):
    """`load_dataset(shard_id=, num_shards=)` shards the TRAIN loaders only:
    pair/unpair streams across fake hosts are disjoint and jointly complete,
    while every host sees the identical full dev split. Defaults come from
    jax.process_index()/process_count() (wired by main.py's
    init_distributed)."""
    from helpers import tiny_config
    from semi_tts_tpu.data import load_dataset

    cfg = tiny_config(str(tmp_path))["data"]

    def fids(loader):
        return [b.fids for b in loader]

    def mk(**kw):
        return load_dataset(0, False, False, cfg["corpus"], cfg["audio"],
                            seed=0, **kw)

    up_all, pr_all, dv_all, *_ = mk(num_shards=1)
    host0 = mk(shard_id=0, num_shards=2)
    host1 = mk(shard_id=1, num_shards=2)
    for k in (0, 1):  # unpair & pair train loaders shard
        a, b, full = fids(host0[k]), fids(host1[k]), fids((up_all, pr_all)[k])
        assert a and b and not (set(map(tuple, a)) & set(map(tuple, b)))
        assert sorted(map(tuple, a + b)) == sorted(map(tuple, full))
    # dev stays unsharded: identical on every host
    assert fids(host0[2]) == fids(host1[2]) == fids(dv_all)
    # default shard args resolve from the jax process env (single-process: 1)
    d_up, d_pr, *_ = mk()
    assert d_pr.num_shards == 1 and d_pr.shard_id == 0
