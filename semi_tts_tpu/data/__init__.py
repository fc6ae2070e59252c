"""Host-side data layer: text codec, corpora, bucketed batch loader, WAV I/O."""

from __future__ import annotations


def load_dataset(n_jobs, use_gpu, pin_memory, corpus, audio, inference_stage=False, seed=0,
                 shard_id=None, num_shards=None):
    """Assemble loaders + featurizer + tokenizer for a solver.

    Parity target: `/root/reference/src/data.py:13-79` — returns
    ``(unpair_set, pair_set, dev_set, test_set, audio_featurizer, tokenizer,
    data_msg)``. The featurizer replaces the reference's AudioConverter: it
    runs on device, so the loaders only carry raw padded waveforms.
    ``n_jobs``/``use_gpu``/``pin_memory`` are accepted for CLI compatibility
    (prefetch threading replaces worker processes).

    Multi-host: ``shard_id``/``num_shards`` default to
    ``jax.process_index()/process_count()`` (after `parallel.mesh.
    init_distributed`), so each host's TRAIN loaders iterate an interleaved
    slice of the identically-seeded shuffled batch stream. Dev/test loaders
    stay unsharded — every host walks the full split so eval metrics and
    logged artifacts are host-independent.
    """
    if num_shards is None:
        import jax

        shard_id, num_shards = jax.process_index(), jax.process_count()
    elif shard_id is None:
        shard_id = 0
    from ..ops.features import AudioConfig, AudioFeaturizer
    from .corpus import create_dataset
    from .loader import TTSLoader
    from .text import load_text_encoder

    data_msg = []
    audio = dict(audio)
    audio.pop("segment_file", None)
    audio.pop("segment_feat", None)
    audio.pop("min_segment_len", None)
    acfg = AudioConfig(
        num_freq=audio["num_freq"], num_mels=audio["num_mels"],
        frame_length_ms=audio["frame_length_ms"], frame_shift_ms=audio["frame_shift_ms"],
        preemphasis_coeff=audio["preemphasis_coeff"], sample_rate=audio["sample_rate"],
        use_linear=audio["use_linear"], snr_range=tuple(audio["snr_range"]),
        time_stretch_range=tuple(audio["time_stretch_range"]),
    )
    featurizer = AudioFeaturizer(acfg)
    feat_type = "Mel/Linear" if acfg.use_linear else "Mel"
    data_msg.append(f"Audio spec.| Feature type = {feat_type}\t\t| Feature dim = "
                    f"({acfg.num_mels}, {acfg.num_freq if acfg.use_linear else None})")

    tokenizer = load_text_encoder("phoneme", vocab_file=corpus["vocab_file"],
                                  map_table=corpus["map_table"])
    data_msg.append(f"Text spec. | Token type = {tokenizer.token_type}\t| "
                    f"Vocab size = {tokenizer.vocab_size}")

    unpair_ds, pair_ds, dev_ds, test_ds, set_msg = create_dataset(
        **corpus, inference_stage=inference_stage)
    data_msg.extend(set_msg)

    def mk(ds, train):
        if ds is None:
            return None
        train = train and not inference_stage
        return TTSLoader(ds, tokenizer, shuffle=train, drop_last=train,
                         seed=seed, sample_rate=acfg.sample_rate,
                         shard_id=shard_id if train else 0,
                         num_shards=num_shards if train else 1)

    unpair_set = mk(unpair_ds, True)
    pair_set = mk(pair_ds, True)
    dev_set = mk(dev_ds, False)
    test_set = mk(test_ds, False) if inference_stage else None

    data_msg.append("Augment    | Speed rate = {}\t| S/N rate = {}".format(
        list(acfg.time_stretch_range), list(acfg.snr_range)))
    return unpair_set, pair_set, dev_set, test_set, featurizer, tokenizer, data_msg
