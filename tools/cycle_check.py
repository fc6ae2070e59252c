#!/usr/bin/env python
"""Semi-supervised CYCLE convergence evidence (VERDICT r2 item 2).

The reference's reason to exist is cycle training
(`/root/reference/bin/train_vqvae.py:137-248`): speech-first and text-first
unpaired cycles coupled through the shared codebook. `tools/overfit_check.py`
proves the supervised path learns; this tool proves the cycles do:

  * corpus: `tests/helpers.make_conditioned_corpus` — audio is synthesized
    deterministically FROM its phoneme transcript over a small inventory, so
    the speech<->text mapping is learnable and dev PER is meaningful
    (unlike the random-transcript fixture corpus).
  * run A ("cycles"): l2 codebook + unpaired speech AND text cycles at the
    reference's weights, small paired split + large unpaired split.
  * run B ("control"): identical config/seed/steps, unpaired weights 0
    (paired-only; the loop then compiles the paired-only step).

PASS requires: unpaired speech-recon and unpaired-text CTC losses decrease,
`unpair_ok` engages (the all-blank escape is NOT permanently gated), and the
cycles run's dev PER beats the paired-only control at equal steps.

Usage: python tools/cycle_check.py [--steps 3000] [--cpu] [--json-out path]
Prints one JSON line; append the result to docs/convergence_evidence.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile


def _r4(v):
    """4-decimal round that passes None (JSON null) through."""
    return round(v, 4) if v is not None else None

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def cycle_config(root, *, unpair_speech, unpair_text, steps, valid_step,
                 start_step=0, n_unpaired=96, n_paired=8, utt_phones=(6, 12),
                 inventory=10):
    from helpers import make_conditioned_corpus, tiny_config

    cfg = tiny_config(root, bone="l2", unpair_speech=unpair_speech,
                      unpair_text=unpair_text, max_step=steps,
                      valid_step=valid_step)
    # supervised warm-up before the cycles engage — the reference's
    # unpair_*_start_step semantics (`bin/train_vqvae.py:129-131`); also
    # makes cycles-vs-control trajectories identical until start_step
    cfg["hparas"]["unpair_speech_start_step"] = start_step
    cfg["hparas"]["unpair_text_start_step"] = start_step
    # batch size must not exceed the paired-split size: drop_last=True would
    # yield ZERO paired batches and infinite(loader) raises (it used to
    # livelock — 47M empty epochs before the guard, see data/loader.py)
    cfg["data"]["corpus"] = make_conditioned_corpus(
        root, n_per_split=(n_paired, n_unpaired, 16, 4),
        utt_phones=utt_phones, batch_size=min(8, n_paired),
        inventory=inventory)
    m = cfg["model"]
    m["spkr_latent_dim"] = 16
    m["encoder"].update(dim=64, rnn_dim=48)
    m["codebook"].update(latent_dim=24, proj_attr=8)
    m["decoder"]["encoder"].update(enc_embed_dim=64)
    m["decoder"]["decoder"].update(prenet_dim=48, query_rnn_dim=96, dec_rnn_dim=96,
                                   attn_dim=48, n_location_filters=8,
                                   location_kernel_size=15)
    cfg["hparas"].update(lr=2e-3)
    return cfg


def run_one(root, *, unpair_speech, unpair_text, steps, seed, start_step=0,
            n_paired=8, utt_phones=(6, 12), n_unpaired=96, inventory=10,
            valid_step=None):
    from helpers import make_paras

    from semi_tts_tpu.train.train_vqvae import VqvaeTrainer

    if valid_step is None:
        valid_step = max(steps // 4, 1)
    cfg = cycle_config(root, unpair_speech=unpair_speech,
                       unpair_text=unpair_text, steps=steps,
                       valid_step=valid_step, start_step=start_step,
                       n_paired=n_paired, utt_phones=utt_phones,
                       n_unpaired=n_unpaired, inventory=inventory)
    paras = make_paras(root, seed=seed)
    solver = VqvaeTrainer(cfg, paras, "train")
    solver.load_data()
    solver.set_model()

    traj = {"unpair_speech": [], "unpair_text": [], "dev_per": [],
            "pair_ctc": [], "dev_tts": []}
    orig = solver.write_log

    def spy(name, value):
        if isinstance(value, dict):
            if name == "txt_loss" and value.get("pair") is not None:
                traj["pair_ctc"].append((solver.step, float(value["pair"])))
            if name == "per" and value.get("dev") is not None:
                traj["dev_per"].append((solver.step, float(value["dev"])))
            if name == "speech_loss" and value.get("dev") is not None:
                traj["dev_tts"].append((solver.step, float(value["dev"])))
        return orig(name, value)

    solver.write_log = spy

    # The progress log lands after a text-first step (step count parity), so
    # the unpaired-SPEECH loss never reaches write_log — sample it straight
    # off each cycle step's metric stream instead. Keep device scalars and
    # fetch once at the end (a float() per step would stall the pipeline).
    pend_s, pend_t = [], []
    orig_sf, orig_tf = solver._speech_first_step, solver._text_first_step

    def sf(*a):
        out = orig_sf(*a)
        if solver.step % 10 == 0:
            pend_s.append((solver.step, out[3]["unpair_speech_loss"]))
        return out

    def tf(*a):
        out = orig_tf(*a)
        if solver.step % 10 == 1:
            pend_t.append((solver.step, out[3]["unpair_text_loss"]))
        return out

    solver._speech_first_step = sf
    solver._text_first_step = tf
    solver.exec()
    import jax

    traj["unpair_speech"] = [(s, float(v)) for (s, _), v in
                             zip(pend_s, jax.device_get([v for _, v in pend_s]))]
    traj["unpair_text"] = [(s, float(v)) for (s, _), v in
                           zip(pend_t, jax.device_get([v for _, v in pend_t]))]

    # unpair_ok engagement: count over a fresh sample of speech-first steps
    # (the step donates params/opt_state, so thread deep COPIES through it)
    ok_engaged = None
    if unpair_speech > 0:
        import jax
        import jax.numpy as jnp

        oks = []
        step_fn = solver._speech_first_step
        p = jax.tree_util.tree_map(jnp.array, solver.params)
        o = jax.tree_util.tree_map(jnp.array, solver.opt_state)
        st = solver.state
        for i in range(4):
            b = solver._shard(next(solver.pair_iter))
            ub = solver._shard(next(solver.unpair_iter))
            p, st, o, mets = step_fn(
                p, st, o, solver.rng, solver.step + 2 * i, 0.9,
                b.waves, b.wave_len, b.text, b.sid,
                ub.waves, ub.wave_len, ub.text, ub.sid)
            oks.append(bool(mets["unpair_ok"]))
        ok_engaged = sum(oks)
    return solver, traj, ok_engaged


def half_means(pairs):
    """(mean of first half, mean of second half) of a [(step, v)] series."""
    import numpy as np

    vals = [v for _, v in pairs if np.isfinite(v)]
    if len(vals) < 2:
        return float("nan"), float("nan")
    h = len(vals) // 2
    return float(np.mean(vals[:h])), float(np.mean(vals[h:]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--start-step", type=int, default=None,
                    help="supervised warm-up before cycles engage "
                         "(default: steps // 4)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n-paired", type=int, default=8,
                    help="paired-split size; smaller = lower-resource, "
                         "more headroom for the unpaired cycles")
    ap.add_argument("--pin-shapes", action="store_true",
                    help="fixed 9-phone utterances: ONE wave-bucket/text-pad "
                         "shape, so each step variant compiles exactly once. "
                         "Low-resource (--n-paired 4) corpora otherwise draw "
                         "more length shapes and every extra shape recompiles "
                         "all three step variants (minutes each over the axon "
                         "tunnel; measured ~5x slower wall-clock)")
    ap.add_argument("--n-unpaired", type=int, default=96,
                    help="unpaired-split size (reference runs 594 paired vs "
                         "54k unpaired — scale this with --n-paired to keep "
                         "a big unpaired:paired ratio in miniature)")
    ap.add_argument("--inventory", type=int, default=10,
                    help="phoneme-inventory size of the synthetic corpus")
    ap.add_argument("--valid-step", type=int, default=None,
                    help="validation cadence (default steps//4)")
    ap.add_argument("--probe", action="store_true",
                    help="warm-up probe: run ONLY the paired-only control and "
                         "report its dev-PER trajectory — used to find the "
                         "bootstrappable regime (dev PER <= ~0.5 before "
                         "cycles engage) before paying for the full A/B")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    start_step = args.start_step if args.start_step is not None else args.steps // 4

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    # Persistent compile cache: the three step variants + validation programs
    # are identical across seeds and arms (shapes don't depend on the seed),
    # so everything after the first run warm-starts — the remote compile
    # service is erratically queued (CLAUDE.md) and would otherwise cost
    # tens of minutes per run.
    from semi_tts_tpu.utils.compile_cache import (default_cache_dir,
                                                  enable_compilation_cache)

    enable_compilation_cache(default_cache_dir())

    import numpy as np  # noqa: F401

    root_b = tempfile.mkdtemp(prefix="control_")

    utt_phones = (9, 10) if args.pin_shapes else (6, 12)
    kw = dict(steps=args.steps, seed=args.seed, start_step=start_step,
              n_paired=args.n_paired, utt_phones=utt_phones,
              n_unpaired=args.n_unpaired, inventory=args.inventory,
              valid_step=args.valid_step)

    if args.probe:
        sol_b, traj_b, _ = run_one(root_b, unpair_speech=0.0,
                                   unpair_text=0.0, **kw)
        best_b = min((v for _, v in traj_b["dev_per"]), default=None)
        result = {
            "experiment": "bootstrap_probe_paired_only",
            "steps": args.steps, "seed": args.seed,
            "n_paired": args.n_paired, "inventory": args.inventory,
            "best_dev_per": _r4(best_b),
            "dev_per_trajectory": [[s, round(v, 4)] for s, v in traj_b["dev_per"]],
            # null = no validation landed, i.e. inconclusive — NOT false
            "bootstrappable": best_b <= 0.5 if best_b is not None else None,
        }
        print(json.dumps(result))
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(result, f, indent=1)
        return 0

    # reference semi-supervised weights (`config/semi-multi-spkr-paired-data.yaml`)
    root_a = tempfile.mkdtemp(prefix="cycles_")  # probe mode never needs it
    sol_a, traj_a, ok_engaged = run_one(root_a, unpair_speech=10.0,
                                        unpair_text=1.0, **kw)
    sol_b, traj_b, _ = run_one(root_b, unpair_speech=0.0, unpair_text=0.0,
                               **kw)

    us_first, us_last = half_means(traj_a["unpair_speech"])
    ut_first, ut_last = half_means(traj_a["unpair_text"])
    per_a = traj_a["dev_per"][-1][1] if traj_a["dev_per"] else None
    # None (JSON null) for missing values everywhere: a bare NaN in the
    # output is not strict JSON and breaks jq/strict parsers downstream
    per_b = traj_b["dev_per"][-1][1] if traj_b["dev_per"] else None
    # the deployment metric is the BEST dev PER over the run — the
    # reference's quality gate checkpoints on dev improvement and deploys
    # that best checkpoint (`bin/train_vqvae.py:332-402`, `--store-best-per`),
    # it never ships the final step. Final-step PER is recorded too but is
    # noisy on this tiny corpus (both runs overfit past ~steps/2).
    best_a = min((v for _, v in traj_a["dev_per"]), default=None)
    best_b = min((v for _, v in traj_b["dev_per"]), default=None)
    # ASR quality when cycles engage (VERDICT r4 #1: the bootstrappability
    # marker) — both arms are trajectory-identical until start_step, so the
    # last validation at/before it measures the warm-up the cycles inherit.
    # None when no validation landed at/before start_step (valid_step >
    # start_step): "unmeasured", not a number.
    per_at_start = next((v for s, v in reversed(traj_a["dev_per"])
                         if s <= start_step), None)

    ok = (us_last < us_first  # unpaired speech recon falls
          and ut_last < ut_first  # unpaired text CTC falls
          and (ok_engaged or 0) > 0  # the all-blank escape disengages
          and best_a is not None and best_b is not None
          and best_a < best_b)  # cycles' best ckpt beats the control's best

    result = {
        "experiment": "semi_supervised_cycles_vs_paired_only",
        "steps": args.steps,
        "cycle_start_step": start_step,
        "dev_per_at_cycle_start": _r4(per_at_start),
        "corpus": "phoneme-conditioned synthetic (%d paired / %d unpaired / 16 dev%s)"
                  % (args.n_paired, args.n_unpaired,
                     ", shape-pinned 9-phone" if args.pin_shapes else ""),
        "dev_tts_cycles": round(traj_a["dev_tts"][-1][1], 4) if traj_a["dev_tts"] else None,
        "dev_tts_control": round(traj_b["dev_tts"][-1][1], 4) if traj_b["dev_tts"] else None,
        "unpair_speech_loss_first_half": round(us_first, 4),
        "unpair_speech_loss_second_half": round(us_last, 4),
        "unpair_text_loss_first_half": round(ut_first, 4),
        "unpair_text_loss_second_half": round(ut_last, 4),
        "unpair_ok_engaged_of_4": ok_engaged,
        "seed": args.seed,
        "dev_per_cycles": _r4(per_a),
        "dev_per_paired_only_control": _r4(per_b),
        "best_dev_per_cycles": _r4(best_a),
        "best_dev_per_control": _r4(best_b),
        "dev_per_trajectory_cycles": [[s, round(v, 4)] for s, v in traj_a["dev_per"]],
        "dev_per_trajectory_control": [[s, round(v, 4)] for s, v in traj_b["dev_per"]],
        "verdict": "PASS" if ok else "FAIL",
    }
    print(json.dumps(result))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(result, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
