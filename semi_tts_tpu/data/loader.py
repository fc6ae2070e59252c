"""Bucketed raw-waveform batch loader.

The reference extracts features *per file on CPU workers inside the collate*
(`/root/reference/src/data.py:112-147`) — the main perf sink of the whole
stack. TPU-native redesign: the host only decodes WAV bytes and pads; STFT/
mel/augmentation run on device inside the jitted train step
(`SURVEY.md §2.2 CPU-worker row`). To keep XLA happy (static shapes, few
recompiles) waveform lengths are padded up to a small geometric bucket grid
and text lengths to a quantum.

A background thread prefetches the next batch so host decode overlaps device
compute (the reference used DataLoader worker processes for this).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from . import wavio

SPEC_PAD_VALUE = 0.0  # `src/data.py:11`

# Default wave-length bucket grid (seconds at 22.05 kHz). Batches pad to the
# smallest bucket >= the batch max; ~10 distinct decode-program shapes total.
DEFAULT_BUCKETS_SEC = (1.0, 1.5, 2.0, 2.5, 3.0, 4.0, 5.0, 6.5, 8.0, 10.0, 12.5, 16.0)
TEXT_QUANTUM = 16


class Batch(dict):
    __getattr__ = dict.__getitem__


def _round_up(n, q):
    return ((n + q - 1) // q) * q


class TTSLoader:
    """Iterates Batches of host-decoded waveforms + encoded text.

    Fields: waves (B, S_bucket) f32, wave_len (B,), sid (B,), text (B, U) i32,
    text_len (B,), fids (list of file ids). Batch order is duration-major
    within a shuffle epoch when the dataset uses bucketing; plain random
    otherwise (reference DataLoader shuffle semantics).
    """

    def __init__(self, dataset, tokenizer, *, batch_size=None, shuffle=True,
                 drop_last=True, seed=0, sample_rate=22050,
                 buckets_sec=DEFAULT_BUCKETS_SEC, prefetch=2,
                 shard_id=0, num_shards=1):
        """``shard_id``/``num_shards``: multi-host data parallelism — each
        host iterates its interleaved slice of the (identically shuffled)
        batch stream (pair with ``jax.process_index()/process_count()``)."""
        self.ds = dataset
        self.tok = tokenizer
        self.shard_id, self.num_shards = shard_id, num_shards
        self.batch_size = batch_size or dataset.bs_for_collate
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)
        self.sr = sample_rate
        self.bucket_samples = sorted(int(b * sample_rate) for b in buckets_sec)
        self.prefetch = prefetch

    def __len__(self):
        n = len(self.ds)
        if self.ds.bucketing:
            return n  # each index yields a bucket (reference semantics)
        return n // self.batch_size if self.drop_last else _round_up(n, self.batch_size) // self.batch_size

    def _item_batches(self):
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
        if self.ds.bucketing:
            for i in order:
                yield self.ds[int(i)]  # already a list of (path, sid)
        else:
            bs = self.batch_size
            stop = n - bs + 1 if self.drop_last else n
            for s in range(0, max(stop, 1), bs):
                idxs = order[s : s + bs]
                if len(idxs) == 0 or (self.drop_last and len(idxs) < bs):
                    return
                yield [self.ds[int(i)] for i in idxs]

    def _bucket_len(self, n):
        for b in self.bucket_samples:
            if n <= b:
                return b
        return _round_up(n, self.bucket_samples[-1])

    def _decode_batch(self, fpaths):
        """Decode wavs -> list of 1-D float32 arrays; native C++ pool when
        available (semi_tts_tpu/native), pure-python wavio otherwise."""
        from .. import native

        cap = self.bucket_samples[-1]
        res = native.wav_read_batch(list(fpaths), cap, channel=0, n_threads=4)
        waves = []
        if res is not None:
            arr, lengths, srs = res
            for i, f in enumerate(fpaths):
                if lengths[i] < 0:  # per-file fallback (odd format)
                    w, sr = wavio.read(f)
                    assert sr == self.sr, f"Sample rate mismatch. Expected {self.sr} but get {sr}"
                    waves.append(w[0])
                else:
                    assert srs[i] == self.sr, \
                        f"Sample rate mismatch. Expected {self.sr} but get {srs[i]}"
                    waves.append(arr[i, : lengths[i]])
            return waves
        for f in fpaths:
            w, sr = wavio.read(f)
            assert sr == self.sr, f"Sample rate mismatch. Expected {self.sr} but get {sr}"
            waves.append(w[0])  # channel 0 (`src/audio.py:177`)
        return waves

    def _collate(self, items):
        fpaths, sids = zip(*items)
        waves = self._decode_batch(fpaths)
        lens = [len(w) for w in waves]
        # sort batch by length desc (`src/data.py:130`)
        order = np.argsort(-np.asarray(lens), kind="stable")
        waves = [waves[i] for i in order]
        lens = [lens[i] for i in order]
        fpaths = [fpaths[i] for i in order]
        sids = [sids[i] for i in order]

        S = self._bucket_len(max(lens))
        wave_arr = np.zeros((len(waves), S), np.float32)
        for i, w in enumerate(waves):
            wave_arr[i, : len(w)] = w

        texts = [self.tok.file_to_seq(f) for f in fpaths]
        U = _round_up(max(len(t) for t in texts), TEXT_QUANTUM)
        text_arr = np.zeros((len(texts), U), np.int32)
        for i, t in enumerate(texts):
            text_arr[i, : len(t)] = t

        from os.path import basename

        return Batch(
            waves=wave_arr,
            wave_len=np.asarray(lens, np.int32),
            sid=np.asarray(sids, np.int32),
            text=text_arr,
            text_len=np.asarray([len(t) for t in texts], np.int32),
            fids=[basename(str(f)).split(".")[0] for f in fpaths],
        )

    def _sharded_batches(self):
        for i, items in enumerate(self._item_batches()):
            if i % self.num_shards == self.shard_id:
                yield items

    def __iter__(self):
        gen = (self._collate(items) for items in self._sharded_batches())
        if self.prefetch <= 0:
            yield from gen
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _END = object()
        err = []

        def worker():
            try:
                for b in gen:
                    q.put(b)
            except BaseException as e:  # surface loader errors to the consumer
                err.append(e)
            finally:
                q.put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            b = q.get()
            if b is _END:
                if err:
                    raise err[0]
                return
            yield b


def infinite(loader):
    """Endless epoch cycling (the reference re-creates exhausted iterators,
    `bin/train_vqvae.py:34-42`).

    Raises instead of livelocking when the loader is empty — e.g. a split
    smaller than ``batch_size`` with ``drop_last=True`` yields zero batches,
    and the reference's re-create-on-exhaustion loop would spin forever
    (each empty pass here also spawns a prefetch thread). Measured: a 4-item
    paired split with batch_size=8 burned 2h+ of CPU in 47M empty epochs."""
    while True:
        n = 0
        for b in loader:
            n += 1
            yield b
        if n == 0:
            raise RuntimeError(
                "infinite(loader): the loader yielded no batches — split "
                "smaller than batch_size with drop_last=True? Lower the "
                "batch size (or disable drop_last) for this split.")
