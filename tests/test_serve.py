"""Serving API (`semi_tts_tpu/serve.py`): the online counterpart of the
offline `--gen-specgram --gen-wav` pipeline (`bin/gen_specgram.py:89-129` +
`util/gen_wav_from_specgram.py:37-57`)."""

from __future__ import annotations

import os
from os.path import join

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from helpers import tiny_config
from semi_tts_tpu.models import vqvae as V
from semi_tts_tpu.ops.features import AudioConfig, AudioFeaturizer
from semi_tts_tpu.serve import TTSServer, serving_stages
from semi_tts_tpu.train.checkpoint import save_checkpoint
from semi_tts_tpu.utils.metrics import read_phn_attr


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    """A tiny trained-shape model saved as a checkpoint + its config yaml,
    loaded back through `TTSServer.from_checkpoint` (the deployment path)."""
    root = tmp_path_factory.mktemp("serve")
    cfg_dict = tiny_config(str(root), bone="l2")
    cfg_path = join(str(root), "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg_dict, f)

    model_cfg = dict(cfg_dict["model"])
    phn_attr = read_phn_attr(model_cfg["codebook"]["phn_attr_pth"])
    cfg = V.config_from_yaml(model_cfg, n_mels=20, linear_dim=257,
                             vocab_size=43, n_spkr=3,
                             attr_dim=phn_attr.shape[1])
    params, state = V.vqvae_init(jax.random.PRNGKey(0), cfg, jnp.asarray(phn_attr))
    ckpt_path = join(str(root), "best_tts_loss.pth")
    save_checkpoint(ckpt_path, params=params, state=state, opt_state={"empty": np.zeros(1)},
                    step=1234)
    server = TTSServer.from_checkpoint(cfg_path, ckpt_path)
    return server, cfg, jnp.asarray(phn_attr), params, state


def _requests(B=2, U=9, seed=0):
    rng = np.random.RandomState(seed)
    text = np.zeros((B, U), np.int32)
    for b in range(B):
        n = rng.randint(4, U - 1)
        text[b, :n] = rng.randint(3, 43, size=n)
    sid = rng.randint(0, 3, size=B).astype(np.int32)
    return text, sid


def test_serving_stages_shapes(served):
    server, cfg, phn_attr, params, state = served
    feat = server.featurizer
    synth, vocode = serving_stages(cfg, feat, phn_attr, decode_steps=10)
    text, sid = _requests()
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    amp = synth(params, state, jnp.asarray(text), jnp.asarray(sid), k1)
    T = 10 * cfg.n_frames_per_step
    assert amp.shape == (2, T, feat.cfg.num_freq)
    assert np.isfinite(np.asarray(amp)).all() and float(jnp.min(amp)) >= 0.0
    wav = vocode(amp, k2)
    assert wav.shape[0] == 2 and wav.ndim == 2
    assert np.isfinite(np.asarray(wav)).all()


def test_decode_length_policy(served):
    server, *_ = served
    text, _ = _requests(U=9)
    steps = server.decode_steps_for(text)
    # bucketed to a multiple of step_bucket and >= the FRAME_PHN_RATIO+margin rule
    assert steps % server.step_bucket == 0
    n_tok = int((text != 0).sum(-1).max()) + 1
    r = server.cfg.n_frames_per_step
    assert steps * r >= int(n_tok * V.FRAME_PHN_RATIO) + 40
    # program cache: same bucket -> same compiled stages object
    assert server.stages(steps) is server.stages(steps)


def test_synthesize_roundtrip_and_determinism(served):
    server, *_ = served
    text, sid = _requests()
    key = jax.random.PRNGKey(3)
    wav1 = server.synthesize(text, sid, key)
    wav2 = server.synthesize(text, sid, key)
    assert wav1.shape[0] == 2 and np.isfinite(wav1).all()
    np.testing.assert_array_equal(wav1, wav2)  # same key -> same request result


def test_synthesize_full_artifacts(served):
    """`synthesize_full` returns the offline solver's artifact set with the
    per-utterance alignment crop of `{id}-align.npy`
    (`bin/gen_specgram.py:112-124`), and its waveform/amp agree with the
    throughput-path stages under the same key."""
    server, cfg, *_ = served
    text, sid = _requests()
    key = jax.random.PRNGKey(5)
    out = server.synthesize_full(text, sid, key)
    steps = server.decode_steps_for(text)
    T = steps * cfg.n_frames_per_step
    assert out["mel"].shape == (2, T, 20)
    assert out["linear"].shape == (2, T, 257)
    enc = (text != 0).sum(-1)
    for i in range(2):
        dec = int(enc[i] * V.FRAME_PHN_RATIO) // cfg.n_frames_per_step
        assert out["align"][i].shape == (dec, enc[i])
    wav_fast = server.synthesize(text, sid, key)
    np.testing.assert_allclose(out["wav"], wav_fast, rtol=0, atol=1e-4)
    # and the two synthesis jits produce the same amplitude spectrogram
    synth, _ = server.stages(steps)
    k1, _ = jax.random.split(key)
    amp_fast = np.asarray(synth(server.params, server.state,
                                jnp.asarray(text), jnp.asarray(sid), k1))
    amp_full = np.asarray(server._full_stage(steps)(
        server.params, server.state, jnp.asarray(text), jnp.asarray(sid), k1)[3])
    np.testing.assert_allclose(amp_full, amp_fast, rtol=1e-5, atol=1e-6)


def test_server_mesh_sharded_equals_single(served):
    """A DP2xTP2-sharded server returns the same waveforms as the unsharded
    one (the serving counterpart of the train-step equality test)."""
    from semi_tts_tpu.parallel.mesh import make_mesh

    server, cfg, phn_attr, params, state = served
    mesh = make_mesh(4, model_parallel=2)
    sharded = TTSServer(cfg, server.featurizer, phn_attr, params, state,
                        mesh=mesh, step_bucket=server.step_bucket)
    text, sid = _requests()
    key = jax.random.PRNGKey(11)
    steps = server.decode_steps_for(text)
    k1, _ = jax.random.split(key)
    synth, _ = server.stages(steps)
    ssynth, _ = sharded.stages(steps)
    t, s = jnp.asarray(text), jnp.asarray(sid)
    ref_amp = np.asarray(synth(server.params, server.state, t, s, k1))
    tt, ss = sharded._place(text, sid)
    got_amp = np.asarray(ssynth(sharded.params, sharded.state, tt, ss, k1))
    np.testing.assert_allclose(got_amp, ref_amp, rtol=5e-3, atol=1e-5)
    # and the full request path executes on the mesh end-to-end
    wav = sharded.synthesize(text, sid, key)
    assert wav.shape[0] == 2 and np.isfinite(wav).all()


def test_program_cache_eviction_recompiles(served):
    """The per-instance program cache is BOUNDED (a long-lived endpoint fed
    adversarial text lengths must not grow compiled programs without limit):
    eviction drops the LRU program and a re-requested bucket recompiles to
    an identical result."""
    server, cfg, phn_attr, params, state = served
    small = TTSServer(cfg, server.featurizer, phn_attr, params, state,
                      program_cache_size=1)
    text, sid = _requests()
    key = jax.random.PRNGKey(17)
    wav_a = small.synthesize(text, sid, key, decode_steps=4)
    first = small.stages(4)
    small.synthesize(text, sid, key, decode_steps=8)  # evicts the 4-bucket
    assert ("stages", 4) not in small._programs
    assert len(small._programs) == 1
    wav_b = small.synthesize(text, sid, key, decode_steps=4)  # recompile
    assert small.stages(4) is not first
    np.testing.assert_array_equal(wav_a, wav_b)


def test_synthesize_thread_safety_hammer(served):
    """8 threads hammer `synthesize` with mixed decode lengths against a
    2-entry program cache (VERDICT r4 #3): every waveform must be finite and
    byte-identical to the single-threaded result for the same key, and the
    LRU must never exceed its bound — exercising eviction-during-use and
    concurrent build/hit/evict interleavings."""
    import threading

    server, cfg, phn_attr, params, state = served
    srv = TTSServer(cfg, server.featurizer, phn_attr, params, state,
                    program_cache_size=2)
    text, sid = _requests()
    lengths = [4, 6, 8]  # 3 buckets > cache size 2 -> constant eviction
    keys = {d: jax.random.PRNGKey(100 + d) for d in lengths}
    expect = {d: srv.synthesize(text, sid, keys[d], decode_steps=d)
              for d in lengths}

    n_threads, n_reqs = 8, 6
    errors, bound_violations = [], []
    barrier = threading.Barrier(n_threads)

    def worker(tid):
        try:
            barrier.wait()
            for i in range(n_reqs):
                d = lengths[(tid + i) % len(lengths)]
                wav = srv.synthesize(text, sid, keys[d], decode_steps=d)
                if not np.isfinite(wav).all():
                    errors.append((tid, d, "non-finite"))
                if not np.array_equal(wav, expect[d]):
                    errors.append((tid, d, "nondeterministic"))
                # the bound is on RETAINED (completed) programs: mid-build
                # cells are never eviction victims (evicting one would let a
                # re-request duplicate its compile) and may transiently push
                # the dict past the bound while builds are in flight
                with srv._lock:
                    n_done = sum(v._done for v in srv._programs.values())
                    n_all = len(srv._programs)
                if n_done > srv.program_cache_size + 1:
                    # +1: one just-completed build may be observed before its
                    # builder re-acquires the lock for the post-build trim
                    bound_violations.append(("done", n_done))
                if n_all > srv.program_cache_size + len(lengths):
                    bound_violations.append(("all", n_all))
        except Exception as e:  # noqa: BLE001 — surface in main thread
            errors.append((tid, None, repr(e)))

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors[:5]
    assert not bound_violations, bound_violations
    assert len(srv._programs) <= srv.program_cache_size


def test_inflight_build_never_evicted_or_duplicated(served):
    """Eviction pressure while a bucket's build is in flight must neither
    evict the mid-build cell (a re-request would start a duplicate
    multi-minute compile) nor run the build twice; concurrent requests for
    the same bucket share one build (`serve._Once` + done-only eviction)."""
    import threading
    import time

    server, cfg, phn_attr, params, state = served
    srv = TTSServer(cfg, server.featurizer, phn_attr, params, state,
                    program_cache_size=1)
    calls = []
    started, release = threading.Event(), threading.Event()

    def slow_build():
        calls.append(1)
        started.set()
        release.wait(60)
        return "slow-value"

    out = {}
    t1 = threading.Thread(
        target=lambda: out.setdefault("a", srv._cached_program("t", 1, slow_build)))
    t1.start()
    assert started.wait(10)
    # fill + churn the 1-entry cache with completed builds while slow is live
    for i in range(2, 5):
        assert srv._cached_program("t", i, lambda i=i: "v%d" % i) == "v%d" % i
    assert ("t", 1) in srv._programs, "in-flight cell was evicted"
    t2 = threading.Thread(
        target=lambda: out.setdefault("b", srv._cached_program("t", 1, slow_build)))
    t2.start()
    time.sleep(0.2)
    release.set()
    t1.join(30)
    t2.join(30)
    assert out["a"] == out["b"] == "slow-value"
    assert len(calls) == 1, "duplicate build of an in-flight bucket"
    assert len(srv._programs) <= srv.program_cache_size  # bounded at rest


def test_key_counter_thread_safety(served):
    """Concurrent key-less requests must never duplicate RNG keys: the
    counter increment is lock-protected, so N draws yield N distinct keys."""
    import threading

    server, *_ = served
    drawn = []
    lock = threading.Lock()
    barrier = threading.Barrier(8)

    def worker():
        barrier.wait()
        ks = [np.asarray(server._key(None)) for _ in range(50)]
        with lock:
            drawn.extend(ks)

    threads = [threading.Thread(target=worker) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    uniq = {k.tobytes() for k in drawn}
    assert len(uniq) == len(drawn) == 400


def test_serving_adversarial_inputs(served):
    """Edge inputs a public endpoint sees in week one (VERDICT r4 #7):
    all-pad text, U=1, batch=1 and non-divisible batch on a mesh, and an
    explicit decode_steps=0 guard."""
    from semi_tts_tpu.parallel.mesh import make_mesh

    server, cfg, phn_attr, params, state = served

    # all-pad text: n_tok floors at 1 -> margin-sized budget, finite audio
    pad_text = np.zeros((2, 9), np.int32)
    sid = np.zeros(2, np.int32)
    steps = server.decode_steps_for(pad_text)
    assert steps >= 1 and steps % server.step_bucket == 0
    wav = server.synthesize(pad_text, sid, jax.random.PRNGKey(0),
                            decode_steps=4)
    assert wav.shape[0] == 2 and np.isfinite(wav).all()

    # U=1 (single-token text)
    one = np.full((1, 1), 5, np.int32)
    wav = server.synthesize(one, sid[:1], jax.random.PRNGKey(1),
                            decode_steps=4)
    assert wav.shape[0] == 1 and np.isfinite(wav).all()

    # text exactly at the bucket boundary: budget lands on a bucket multiple
    r = cfg.n_frames_per_step
    b = server.step_bucket
    # find U whose raw step need is exactly b (if none exists the policy
    # still buckets up — assert the invariant instead)
    for U in range(1, 64):
        need = (int((U + 1) * V.FRAME_PHN_RATIO) + 40 + r - 1) // r
        t = np.full((1, U), 5, np.int32)
        got = server.decode_steps_for(t)
        assert got % b == 0 and got >= need

    # decode_steps=0 (and negatives) are rejected loudly, not silently
    text, sid2 = _requests()
    with pytest.raises(ValueError, match="decode_steps"):
        server.synthesize(text, sid2, decode_steps=0)
    with pytest.raises(ValueError, match="decode_steps"):
        server.synthesize_full(text, sid2, decode_steps=-3)

    # mesh + batch=1 (< data axis) and batch=3 (non-divisible): shard_batch
    # replicates ragged batches instead of crashing — correct output, just
    # no DP split for that request (parallel/mesh.py:67-72)
    mesh = make_mesh(4, model_parallel=2)
    sharded = TTSServer(cfg, server.featurizer, phn_attr, params, state,
                        mesh=mesh)
    for B in (1, 3):
        t, s = _requests(B=B)
        wav = sharded.synthesize(t, s, jax.random.PRNGKey(2), decode_steps=4)
        assert wav.shape[0] == B and np.isfinite(wav).all()
