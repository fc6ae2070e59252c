"""On-device DSP + numerical primitives (STFT, mel, Griffin-Lim, CTC, RNN scans)."""
