"""Base solver: experiment naming, logging, progress, checkpoint policy.

Parity target: `/root/reference/src/solver.py` — the load_data/set_model/exec
lifecycle (`:52-120`), TensorBoard writer with 180 s flush (`:43`),
polymorphic ``write_log`` routing by log-name substring (`:178-202`),
``[INFO]``/progress stdout with ANSI line-clear (`:153-176`), and the
``{model, optimizer, global_step}`` checkpoint (`:204-218`).
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

from ..utils.metrics import human_format
from ..utils.timer import Timer
from .checkpoint import save_checkpoint

TB_FLUSH_FREQ = 180


class BaseSolver:
    def __init__(self, config, paras, mode):
        self._GRAD_CLIP = 5.0
        self._PROGRESS_STEP = 20
        self._DEV_N_EXAMPLE = 4

        self.config = config
        self.paras = paras
        self.mode = mode

        self.exp_name = paras.name
        if self.exp_name is None:
            self.exp_name = "-".join(
                [os.path.basename(paras.config).replace(".yaml", ""), "sd" + str(paras.seed)])

        os.makedirs(paras.ckpdir, exist_ok=True)
        self.ckpdir = os.path.join(paras.ckpdir, self.exp_name)
        os.makedirs(self.ckpdir, exist_ok=True)
        self.logdir = os.path.join(paras.logdir, self.exp_name)

        self.log = None
        if mode == "train":
            try:
                from tensorboardX import SummaryWriter

                self.log = SummaryWriter(self.logdir, flush_secs=TB_FLUSH_FREQ)
            except Exception:  # logging must never kill training
                self.log = None
            self.timer = Timer()
            self.step = 0
            self.valid_step = config["hparas"]["valid_step"]
            self.max_step = config["hparas"]["max_step"]

    # ------------- lifecycle (implemented by subclasses) -------------
    def load_data(self):
        raise NotImplementedError

    def set_model(self):
        raise NotImplementedError

    def exec(self):
        raise NotImplementedError

    # ------------- device mesh (shared by trainers + inference solvers) ----
    def _make_mesh(self):
        """('data','model') mesh from --mesh DxM; None = single device."""
        import jax

        spec = getattr(self.paras, "mesh", "") or ""
        if not spec:
            return None
        from ..parallel.mesh import make_mesh

        try:
            d, m = (int(v) for v in spec.lower().split("x"))
        except ValueError:
            raise SystemExit(f"--mesh must look like 4x2 (data x model), got {spec!r}")
        n = d * m
        have = len(jax.devices())
        if n > have:
            raise SystemExit(f"--mesh {spec} needs {n} devices, only {have} visible "
                             "(for CPU testing set XLA_FLAGS="
                             "--xla_force_host_platform_device_count=N)")
        mesh = make_mesh(n, model_parallel=m)
        self.verbose(f"Device mesh: data={d} x model={m} over {n} devices")
        return mesh

    def _shard(self, batch):
        """Place a host batch with its leading axis over the 'data' mesh axis."""
        if self.mesh is None:
            return batch
        from ..parallel.mesh import shard_batch

        return shard_batch(batch, self.mesh)

    # ------------- default methods -------------
    def verbose(self, msg):
        if self.paras.verbose:
            self._clean_line()
            if isinstance(msg, str):
                print("[INFO]", msg)
            else:
                for m in msg:
                    print("[INFO]", m)

    def progress(self, msg):
        if self.paras.verbose:
            self._clean_line()
            print("[{}] {}".format(human_format(self.step), msg), end="\r")

    def _clean_line(self):
        sys.stdout.write("\033[K")

    def write_log(self, log_name, log_value):
        """Route by name substring: align|spec|hist -> image, code ->
        embedding, wave -> audio, text|hyp -> text, else scalars."""
        if isinstance(log_value, dict):
            log_value = {k: float(v) for k, v in log_value.items()
                         if v is not None and not math.isnan(float(v))}
        if self.log is None or log_value is None:
            return
        if hasattr(log_value, "__len__") and len(log_value) == 0:
            return
        if "align" in log_name or "spec" in log_name or "hist" in log_name:
            img, form = log_value
            self.log.add_image(log_name, np.asarray(img), global_step=self.step, dataformats=form)
        elif "code" in log_name:
            self.log.add_embedding(np.asarray(log_value[0]), metadata=log_value[1],
                                   tag=log_name, global_step=self.step)
        elif "wave" in log_name:
            # tensorboardX audio needs the optional `soundfile` package;
            # degrade to skipping audio logs when it's absent
            try:
                import soundfile  # noqa: F401
            except ImportError:
                return
            signal, sr = log_value
            # tensorboardX expects (frames,) or (frames, channels<=2)
            self.log.add_audio(log_name, np.asarray(signal, np.float32).reshape(-1, 1),
                               self.step, sr)
        elif "text" in log_name or "hyp" in log_name:
            self.log.add_text(log_name, log_value, self.step)
        else:
            self.log.add_scalars(log_name, log_value, self.step)

    def save_checkpoint_triple(self, f_name, score, *, params, state, opt_state,
                               extra=None):
        path = os.path.join(self.ckpdir, f_name)
        save_checkpoint(path, params=params, state=state, opt_state=opt_state,
                        step=self.step, extra=extra)
        self.verbose("Saved checkpoint (step = {}, score = {:.2f}) and status @ {}".format(
            human_format(self.step), score, path))
