"""Short-time Fourier transform with torch.stft semantics, in JAX.

The reference's loss stack is built on ``torch.stft`` (rectangular window,
reference/utils/criterion.py:74-75) and auraloss's STFT losses (Hann
window, criterion.py:33) running on cuFFT. This module reproduces
torch.stft's exact conventions so the loss values are comparable:

  * ``center=True`` pads n_fft//2 on both sides (reflect by default);
  * a ``win_length < n_fft`` window is zero-padded symmetrically to n_fft
    (left pad = (n_fft − win_length)//2), ``window=None`` means
    rectangular ones of length win_length;
  * Hann windows are periodic (torch.hann_window default);
  * output layout is [..., n_freq, n_frames] (freq-major, like torch).

Frame extraction is a static gather (frames × n_fft index matrix) feeding
one batched rFFT — XLA fuses the gather+window multiply, and on TPU the
FFT lowers to MXU matmuls for these small sizes.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def hann_window(win_length: int, dtype=jnp.float32) -> Array:
    """Periodic Hann window, identical to torch.hann_window(win_length)."""
    n = np.arange(win_length)
    return jnp.asarray(0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length)), dtype)


def _prepare_window(
    window: Optional[Array], n_fft: int, win_length: Optional[int], dtype
) -> Array:
    win_length = win_length or n_fft
    if window is None:
        window = jnp.ones((win_length,), dtype)
    if win_length < n_fft:
        left = (n_fft - win_length) // 2
        window = jnp.pad(window, (left, n_fft - win_length - left))
    return window.astype(dtype)


def stft(
    x: Array,
    n_fft: int,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Optional[Array] = None,
    center: bool = True,
    pad_mode: str = "reflect",
) -> Array:
    """Complex STFT of real input x [..., T] → [..., n_fft//2+1, frames]."""
    hop = hop_length or n_fft // 4
    win = _prepare_window(window, n_fft, win_length, x.dtype)

    if center:
        pad = n_fft // 2
        cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        x = jnp.pad(x, cfg, mode=pad_mode)

    total = x.shape[-1]
    n_frames = 1 + (total - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[..., idx] * win  # [..., frames, n_fft]
    spec = jnp.fft.rfft(frames, axis=-1)  # [..., frames, F]
    return jnp.swapaxes(spec, -1, -2)  # [..., F, frames]


def stft_magnitude(
    x: Array,
    n_fft: int,
    hop_length: Optional[int] = None,
    win_length: Optional[int] = None,
    window: Optional[Array] = None,
    eps: float = 1e-8,
    center: bool = True,
) -> Array:
    """Clamped magnitude: sqrt(max(re²+im², eps)) — auraloss's convention."""
    s = stft(x, n_fft, hop_length, win_length, window, center=center)
    return jnp.sqrt(jnp.maximum(jnp.real(s) ** 2 + jnp.imag(s) ** 2, eps))
