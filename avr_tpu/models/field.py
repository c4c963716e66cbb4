"""Neural impulse-response fields.

Re-designs reference/model.py's ``AVRModel`` (MeshRIR/Simu/Real_env,
model.py:63-235) and ``AVRModel_complex`` (RAF, model.py:238-331) as one
functional module with two variants:

  * ``standard``: hash encodings for position / view direction / tx
    position; sigma encoder (→128) + decoder (→1 attenuation); signal
    network over concat(sigma_feat, dir_enc, tx_enc); optional microphone
    channel conditioning in "add" (per-layer bias injection) or "concat"
    (input embedding row) mode.
  * ``complex``: six encodings (pos/tx-pos for sigma, pos/tx-pos for
    signal, view dir, tx dir), 256-wide sigma feature, signal network over
    five concatenated parts. Unlike the reference (whose RAF path crashes
    on ch_idx, see SURVEY.md quirks), ch_idx is uniformly optional.

All inputs are [−1,1] box coordinates; fields map them to the unit cube
with (x+1)/2 exactly as reference/model.py:187-189,310-313 does.

The factored query API is the TPU-first piece: direction and transmitter
encodings depend only on the ray / batch element, so the fused renderer
encodes them once ([R,D] and [B,D] instead of [B·R·S,D]) and folds each
part into the signal network's first matmul via ``mlp.input_weight_slices``
— mathematically identical to concatenation, ~3× fewer hash gathers and a
much smaller first matmul.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from avr_tpu.config import EncodingConfig, ModelConfig
from avr_tpu.models import hashgrid, mlp

Array = jax.Array


# ----------------------------------------------------------------------
# Encoding wrapper (HashGrid | Frequency | Identity)
# ----------------------------------------------------------------------
@dataclass(frozen=True)
class EncStatic:
    otype: str
    grid: Optional[hashgrid.HashGridStatic]
    n_frequencies: int
    n_output_dims: int


def _enc_static(cfg: EncodingConfig) -> EncStatic:
    ot = cfg.otype.lower()
    if ot in ("hashgrid", "grid", "densegrid"):
        g = hashgrid.build_static(cfg)
        return EncStatic("hashgrid", g, 0, g.n_output_dims)
    if ot == "frequency":
        return EncStatic("frequency", None, cfg.n_frequencies, 6 * cfg.n_frequencies)
    if ot == "identity":
        return EncStatic("identity", None, 0, 3)
    raise ValueError(f"unsupported encoding otype {cfg.otype!r}")


def _enc_init(key: Array, st: EncStatic):
    if st.otype == "hashgrid":
        return hashgrid.init(key, st.grid)
    return None


def _enc_apply(param, st: EncStatic, x01: Array, compute_dtype=None) -> Array:
    if st.otype == "hashgrid":
        return hashgrid.encode(param, st.grid, x01, compute_dtype=compute_dtype)
    if st.otype == "frequency":
        return hashgrid.frequency_encode(x01, st.n_frequencies)
    return x01


# ----------------------------------------------------------------------
# Field statics
# ----------------------------------------------------------------------
SIGMA_FEAT_STANDARD = 128  # reference/model.py:99,119 hardcodes 128
SIGMA_FEAT_COMPLEX = 256  # reference/model.py:269


@dataclass(frozen=True)
class FieldStatic:
    variant: str  # "standard" | "complex"
    signal_output_dim: int
    leaky_slope: float
    encodings: Dict[str, EncStatic]
    sigma_encoder: mlp.MLPStatic
    sigma_decoder: mlp.MLPStatic
    signal: mlp.MLPStatic
    # channel conditioning modes per subnet: "none" | "add" | "concat"
    enc_mode: str = "none"
    dec_mode: str = "none"
    sig_mode: str = "none"
    ch_num: int = 0
    emb_dim_enc: int = 0
    emb_dim_dec: int = 0
    emb_dim_sig: int = 0

    @property
    def sigma_feat_dim(self) -> int:
        return self.sigma_encoder.n_output_dims


def build_field(cfg: ModelConfig, dataset_type: str = "MeshRIR") -> FieldStatic:
    """Map a ModelConfig (reference YAML schema) to a FieldStatic.

    Dataset → variant selection follows reference/avr_runner.py:55-58:
    RAF uses the complex variant, everything else the standard one.
    """
    if dataset_type == "RAF":
        return _build_complex(cfg)
    return _build_standard(cfg)


def _mlp_static(cfg, n_in, n_out, inject=False, ch_num=0) -> mlp.MLPStatic:
    return mlp.MLPStatic(
        n_input_dims=n_in,
        n_output_dims=n_out,
        n_neurons=cfg.n_neurons,
        n_hidden_layers=cfg.n_hidden_layers,
        activation=cfg.activation,
        output_activation=cfg.output_activation,
        use_bias=cfg.use_bias,
        inject=inject,
        ch_num=ch_num,
    )


def _build_standard(cfg: ModelConfig) -> FieldStatic:
    enc = {
        "pos": _enc_static(cfg.pos_encoding_sigma),
        "dir": _enc_static(cfg.dir_encoding_sig),
        "tx": _enc_static(cfg.tx_encoding_sig),
    }
    ch = cfg.channel_embed
    mode = ch.connection_type if ch.is_embed else "none"
    enc_mode = mode if (ch.is_embed and ch.is_sigma_encoder) else "none"
    dec_mode = mode if (ch.is_embed and ch.is_sigma_decoder) else "none"
    sig_mode = mode if (ch.is_embed and ch.is_signal_network) else "none"

    d_enc = ch.emb_dim_sigma_encoder if enc_mode == "concat" else 0
    d_dec = ch.emb_dim_sigma_decoder if dec_mode == "concat" else 0
    d_sig = ch.emb_dim_signal_network if sig_mode == "concat" else 0

    enc_in = enc["pos"].n_output_dims + d_enc
    sig_in = (
        SIGMA_FEAT_STANDARD + enc["dir"].n_output_dims + enc["tx"].n_output_dims + d_sig
    )
    return FieldStatic(
        variant="standard",
        signal_output_dim=cfg.signal_output_dim,
        # AVRModel uses F.leaky_relu's default slope and ignores the YAML
        # value (reference/model.py:233); only the complex variant reads it.
        leaky_slope=0.01,
        encodings=enc,
        sigma_encoder=_mlp_static(
            cfg.sigma_encoder_network,
            enc_in,
            SIGMA_FEAT_STANDARD,
            inject=(enc_mode == "add"),
            ch_num=ch.ch_num,
        ),
        sigma_decoder=_mlp_static(
            cfg.sigma_decoder_network,
            SIGMA_FEAT_STANDARD + d_dec,
            1,
            inject=(dec_mode == "add"),
            ch_num=ch.ch_num,
        ),
        signal=_mlp_static(
            cfg.signal_network,
            sig_in,
            cfg.signal_output_dim,
            inject=(sig_mode == "add"),
            ch_num=ch.ch_num,
        ),
        enc_mode=enc_mode,
        dec_mode=dec_mode,
        sig_mode=sig_mode,
        ch_num=ch.ch_num,
        emb_dim_enc=d_enc,
        emb_dim_dec=d_dec,
        emb_dim_sig=d_sig,
    )


def _build_complex(cfg: ModelConfig) -> FieldStatic:
    def enc_or_default(c: Optional[EncodingConfig]) -> EncStatic:
        return _enc_static(c if c is not None else EncodingConfig())

    enc = {
        "pos": enc_or_default(cfg.pos_encoding_sigma),
        "tx_pos": enc_or_default(cfg.tx_pos_encoding_sigma),
        "pos_sig": enc_or_default(cfg.pos_encoding_sig),
        "tx_pos_sig": enc_or_default(cfg.tx_pos_encoding_sig),
        "dir": enc_or_default(cfg.dir_encoding_sig),
        "tx_dir": enc_or_default(cfg.tx_dir_encoding_sig),
    }
    enc_in = enc["pos"].n_output_dims + enc["tx_pos"].n_output_dims
    sig_in = (
        SIGMA_FEAT_COMPLEX
        + enc["dir"].n_output_dims
        + enc["tx_dir"].n_output_dims
        + enc["pos_sig"].n_output_dims
        + enc["tx_pos_sig"].n_output_dims
    )
    return FieldStatic(
        variant="complex",
        signal_output_dim=cfg.signal_output_dim,
        leaky_slope=float(cfg.leaky_relu),
        encodings=enc,
        sigma_encoder=_mlp_static(cfg.sigma_encoder_network, enc_in, SIGMA_FEAT_COMPLEX),
        sigma_decoder=_mlp_static(cfg.sigma_decoder_network, SIGMA_FEAT_COMPLEX, 1),
        signal=_mlp_static(cfg.signal_network, sig_in, cfg.signal_output_dim),
    )


# ----------------------------------------------------------------------
# Params
# ----------------------------------------------------------------------
def init(key: Array, static: FieldStatic) -> Dict:
    keys = jax.random.split(key, len(static.encodings) + 6)
    params: Dict = {"enc": {}, "concat_emb": {}}
    for i, (name, st) in enumerate(sorted(static.encodings.items())):
        p = _enc_init(keys[i], st)
        if p is not None:
            params["enc"][name] = p
    if _paired_pos(static) and "pos" in params["enc"]:
        # Same-geometry pos/pos_sig tables are stored as ONE fused
        # [rows, 2F] parameter: one gather forward, one scatter-add
        # backward, and no per-step concat/split (the split + layout
        # copies alone measured ~14 ms/step on the RAF flagship).
        params["enc"]["pos_pair"] = jnp.concatenate(
            [params["enc"].pop("pos"), params["enc"].pop("pos_sig")], axis=-1
        )
    k = len(static.encodings)
    params["sigma_encoder"] = mlp.init(keys[k], static.sigma_encoder)
    params["sigma_decoder"] = mlp.init(keys[k + 1], static.sigma_decoder)
    params["signal"] = mlp.init(keys[k + 2], static.signal)
    # concat embeddings: randn/sqrt(dim) (reference/model.py:109-111 etc.)
    for name, mode, dim, kk in (
        ("enc", static.enc_mode, static.emb_dim_enc, keys[k + 3]),
        ("dec", static.dec_mode, static.emb_dim_dec, keys[k + 4]),
        ("sig", static.sig_mode, static.emb_dim_sig, keys[k + 5]),
    ):
        if mode == "concat" and dim > 0:
            params["concat_emb"][name] = jax.random.normal(
                kk, (static.ch_num, dim), jnp.float32
            ) / jnp.sqrt(jnp.asarray(dim, jnp.float32))
    return params


def _enc(
    params: Dict, static: FieldStatic, name: str, x01: Array, compute_dtype=None
) -> Array:
    if name in ("pos", "pos_sig") and "pos_pair" in params["enc"]:
        a, b = hashgrid.encode_pair_fused(
            params["enc"]["pos_pair"], static.encodings["pos"].grid, x01,
            compute_dtype=compute_dtype,
        )
        return a if name == "pos" else b
    return _enc_apply(
        params["enc"].get(name), static.encodings[name], x01,
        compute_dtype=compute_dtype,
    )


def _to01(x: Array) -> Array:
    return (x + 1.0) / 2.0


# ----------------------------------------------------------------------
# Full (unfactored) query — the oracle path. Mirrors the reference's
# per-point concatenation exactly; used for parity tests and small evals.
# ----------------------------------------------------------------------
def apply(
    params: Dict,
    static: FieldStatic,
    pts: Array,
    view: Array,
    tx: Array,
    tx_view: Optional[Array] = None,
    ch_idx: Optional[Array] = None,
    compute_dtype=None,
) -> Tuple[Array, Array]:
    """Query the field at points.

    pts/view/tx[/tx_view]: [..., 3] in [−1,1]; ch_idx: [...] int32 or None.
    Returns (attn [..., 1], signal [..., signal_output_dim]).
    """
    if static.variant == "complex":
        return _apply_complex(params, static, pts, view, tx, tx_view, compute_dtype)
    return _apply_standard(params, static, pts, view, tx, ch_idx, compute_dtype)


def _concat_emb(params, name: str, ch_idx: Array, like: Array) -> Array:
    emb = params["concat_emb"][name][ch_idx]  # [..., dim]
    return jnp.broadcast_to(emb, (*like.shape[:-1], emb.shape[-1]))


def _apply_standard(params, static, pts, view, tx, ch_idx, compute_dtype):
    pos_enc = _enc(params, static, "pos", _to01(pts))
    enc_in = pos_enc
    if static.enc_mode == "concat" and ch_idx is not None:
        enc_in = jnp.concatenate(
            [enc_in, _concat_emb(params, "enc", ch_idx, pos_enc)], axis=-1
        )
    sigma_feat = mlp.apply(
        params["sigma_encoder"], static.sigma_encoder, enc_in,
        ch_idx=ch_idx if static.enc_mode == "add" else None,
        compute_dtype=compute_dtype,
    )

    dec_in = jax.nn.relu(sigma_feat)
    if static.dec_mode == "concat" and ch_idx is not None:
        dec_in = jnp.concatenate(
            [dec_in, _concat_emb(params, "dec", ch_idx, dec_in)], axis=-1
        )
    raw = mlp.apply(
        params["sigma_decoder"], static.sigma_decoder, dec_in,
        ch_idx=ch_idx if static.dec_mode == "add" else None,
        compute_dtype=compute_dtype,
    )
    attn = jnp.abs(jax.nn.leaky_relu(raw, static.leaky_slope))

    dir_enc = _enc(params, static, "dir", _to01(view))
    tx_enc = _enc(params, static, "tx", _to01(tx))
    sig_in = jnp.concatenate([sigma_feat, dir_enc, tx_enc], axis=-1)
    if static.sig_mode == "concat" and ch_idx is not None:
        sig_in = jnp.concatenate(
            [sig_in, _concat_emb(params, "sig", ch_idx, sig_in)], axis=-1
        )
    signal = mlp.apply(
        params["signal"], static.signal, sig_in,
        ch_idx=ch_idx if static.sig_mode == "add" else None,
        compute_dtype=compute_dtype,
    )
    return attn, signal


def _apply_complex(params, static, pts, view, tx, tx_view, compute_dtype):
    if tx_view is None:
        raise ValueError("complex field variant requires tx_view")
    p01, v01, t01, tv01 = _to01(pts), _to01(view), _to01(tx), _to01(tx_view)
    pos_enc = _enc(params, static, "pos", p01)
    tx_pos_enc = _enc(params, static, "tx_pos", t01)
    sigma_feat = mlp.apply(
        params["sigma_encoder"],
        static.sigma_encoder,
        jnp.concatenate([pos_enc, tx_pos_enc], axis=-1),
        compute_dtype=compute_dtype,
    )
    raw = mlp.apply(
        params["sigma_decoder"], static.sigma_decoder, jax.nn.relu(sigma_feat),
        compute_dtype=compute_dtype,
    )
    attn = jnp.abs(jax.nn.leaky_relu(raw, static.leaky_slope))

    sig_in = jnp.concatenate(
        [
            jax.nn.relu(sigma_feat),
            _enc(params, static, "dir", v01),
            _enc(params, static, "tx_dir", tv01),
            _enc(params, static, "pos_sig", p01),
            _enc(params, static, "tx_pos_sig", t01),
        ],
        axis=-1,
    )
    signal = mlp.apply(
        params["signal"], static.signal, sig_in, compute_dtype=compute_dtype
    )
    return attn, signal


# ----------------------------------------------------------------------
# Factored query API — used by the fused renderer.
# ----------------------------------------------------------------------
def sigma_query(
    params: Dict,
    static: FieldStatic,
    pts: Array,
    tx: Optional[Array] = None,
    ch_idx: Optional[Array] = None,
    compute_dtype=None,
) -> Tuple[Array, Array]:
    """Per-point sigma branch: returns (sigma_feat [...,D], attn [...,1]).

    ``tx`` is only needed by the complex variant ([..., 3], broadcastable
    against pts' leading dims).
    """
    if static.variant == "complex":
        pos_enc = _enc(params, static, "pos", _to01(pts), compute_dtype=compute_dtype)
        tx_pos_enc = _enc(params, static, "tx_pos", _to01(tx))
        tx_pos_enc = jnp.broadcast_to(tx_pos_enc, (*pos_enc.shape[:-1], tx_pos_enc.shape[-1]))
        # Fold the two concat parts into the first matmul separately so the
        # per-batch tx part can stay at batch granularity upstream.
        w_pos, w_tx = mlp.input_weight_slices(
            params["sigma_encoder"], [pos_enc.shape[-1], tx_pos_enc.shape[-1]]
        )
        h = mlp._matmul(pos_enc, w_pos, compute_dtype) + mlp._matmul(
            tx_pos_enc, w_tx, compute_dtype
        )
        if static.sigma_encoder.use_bias:
            h = h + params["sigma_encoder"]["b"][0]
        sigma_feat = mlp.apply_tail(
            params["sigma_encoder"], static.sigma_encoder, h,
            compute_dtype=compute_dtype,
        )
        raw = mlp.apply(
            params["sigma_decoder"], static.sigma_decoder, jax.nn.relu(sigma_feat),
            compute_dtype=compute_dtype,
        )
    else:
        pos_enc = _enc(params, static, "pos", _to01(pts), compute_dtype=compute_dtype)
        enc_in = pos_enc
        if static.enc_mode == "concat" and ch_idx is not None:
            enc_in = jnp.concatenate(
                [enc_in, _concat_emb(params, "enc", ch_idx, pos_enc)], axis=-1
            )
        sigma_feat = mlp.apply(
            params["sigma_encoder"], static.sigma_encoder, enc_in,
            ch_idx=ch_idx if static.enc_mode == "add" else None,
            compute_dtype=compute_dtype,
        )
        dec_in = jax.nn.relu(sigma_feat)
        if static.dec_mode == "concat" and ch_idx is not None:
            dec_in = jnp.concatenate(
                [dec_in, _concat_emb(params, "dec", ch_idx, dec_in)], axis=-1
            )
        raw = mlp.apply(
            params["sigma_decoder"], static.sigma_decoder, dec_in,
            ch_idx=ch_idx if static.dec_mode == "add" else None,
            compute_dtype=compute_dtype,
        )
    attn = jnp.abs(jax.nn.leaky_relu(raw, static.leaky_slope))
    return sigma_feat, attn


def signal_context(
    params: Dict,
    static: FieldStatic,
    dirs: Array,
    tx: Array,
    tx_view: Optional[Array] = None,
    ch_idx: Optional[Array] = None,
    compute_dtype=None,
) -> Tuple[Array, Array]:
    """Precompute the per-ray and per-batch first-layer contributions.

    dirs: [R, 3] ray directions (view = −dir is applied here);
    tx: [B, 3] normalized tx positions; tx_view: [B, 3] for complex.
    Returns (h_ray [R, W], h_batch [B, W]) — pre-activation parts to add to
    the per-point part. The constant bias is folded into h_batch.
    """
    if static.variant == "complex":
        dims = [
            SIGMA_FEAT_COMPLEX,
            static.encodings["dir"].n_output_dims,
            static.encodings["tx_dir"].n_output_dims,
            static.encodings["pos_sig"].n_output_dims,
            static.encodings["tx_pos_sig"].n_output_dims,
        ]
        w_feat, w_dir, w_txd, w_psig, w_tsig = mlp.input_weight_slices(
            params["signal"], dims
        )
        del w_feat, w_psig  # per-point parts, applied by the caller
        dir_enc = _enc(params, static, "dir", _to01(-dirs))
        txd_enc = _enc(params, static, "tx_dir", _to01(tx_view))
        tsig_enc = _enc(params, static, "tx_pos_sig", _to01(tx))
        h_ray = mlp._matmul(dir_enc, w_dir, compute_dtype)
        h_batch = mlp._matmul(txd_enc, w_txd, compute_dtype) + mlp._matmul(
            tsig_enc, w_tsig, compute_dtype
        )
    else:
        dims = [
            SIGMA_FEAT_STANDARD,
            static.encodings["dir"].n_output_dims,
            static.encodings["tx"].n_output_dims,
        ]
        if static.sig_mode == "concat":
            dims.append(static.emb_dim_sig)
        slices = mlp.input_weight_slices(params["signal"], dims)
        w_dir, w_tx = slices[1], slices[2]
        dir_enc = _enc(params, static, "dir", _to01(-dirs))
        tx_enc = _enc(params, static, "tx", _to01(tx))
        h_ray = mlp._matmul(dir_enc, w_dir, compute_dtype)
        h_batch = mlp._matmul(tx_enc, w_tx, compute_dtype)
        if static.sig_mode == "concat" and ch_idx is not None:
            emb = params["concat_emb"]["sig"][ch_idx]  # [B, dim]
            h_batch = h_batch + mlp._matmul(emb, slices[3], compute_dtype)
    if static.signal.use_bias:
        h_batch = h_batch + params["signal"]["b"][0]
    return h_ray, h_batch


def point_features(
    params: Dict,
    static: FieldStatic,
    pts: Array,
    tx: Optional[Array] = None,
    ch_idx: Optional[Array] = None,
    compute_dtype=None,
) -> Tuple[Array, Array, Optional[Array]]:
    """All per-point quantities the signal tail needs, in one pass.

    Returns (sigma_feat [...,D], attn [...,1], psig_enc [...,E] or None).
    This is the gather-heavy stage: evaluating it ONCE for every sample
    point (instead of per shell inside the scan) means each hash table
    sees exactly one gather in the forward and one scatter-add in the
    backward pass per step. When the complex variant's two position
    encodings share the same grid geometry (true for every reference RAF
    config), both are served by a single fused gather (encode_pair).
    """
    if static.variant == "complex" and _paired_pos(static):
        e_pos = static.encodings["pos"]
        if "pos_pair" in params["enc"]:
            pos_enc, psig_enc = hashgrid.encode_pair_fused(
                params["enc"]["pos_pair"], e_pos.grid, _to01(pts),
                compute_dtype=compute_dtype,
            )
        else:  # legacy param layout (separate tables)
            pos_enc, psig_enc = hashgrid.encode_pair(
                params["enc"]["pos"], params["enc"]["pos_sig"], e_pos.grid,
                _to01(pts), compute_dtype=compute_dtype,
            )
        tx_pos_enc = _enc(params, static, "tx_pos", _to01(tx))
        tx_pos_enc = jnp.broadcast_to(
            tx_pos_enc, (*pos_enc.shape[:-1], tx_pos_enc.shape[-1])
        )
        w_pos, w_tx = mlp.input_weight_slices(
            params["sigma_encoder"], [pos_enc.shape[-1], tx_pos_enc.shape[-1]]
        )
        h = mlp._matmul(pos_enc, w_pos, compute_dtype) + mlp._matmul(
            tx_pos_enc, w_tx, compute_dtype
        )
        if static.sigma_encoder.use_bias:
            h = h + params["sigma_encoder"]["b"][0]
        sigma_feat = mlp.apply_tail(
            params["sigma_encoder"], static.sigma_encoder, h,
            compute_dtype=compute_dtype,
        )
        raw = mlp.apply(
            params["sigma_decoder"], static.sigma_decoder, jax.nn.relu(sigma_feat),
            compute_dtype=compute_dtype,
        )
        attn = jnp.abs(jax.nn.leaky_relu(raw, static.leaky_slope))
        return sigma_feat, attn, psig_enc

    sigma_feat, attn = sigma_query(
        params, static, pts, tx=tx, ch_idx=ch_idx, compute_dtype=compute_dtype
    )
    psig_enc = (
        _enc(params, static, "pos_sig", _to01(pts), compute_dtype=compute_dtype)
        if static.variant == "complex"
        else None
    )
    return sigma_feat, attn, psig_enc


def _paired_pos(static: FieldStatic) -> bool:
    """True when pos & pos_sig encodings can share one fused gather."""
    a = static.encodings.get("pos")
    b = static.encodings.get("pos_sig")
    return (
        a is not None and b is not None
        and a.otype == "hashgrid" and b.otype == "hashgrid"
        and a.grid == b.grid
    )


def signal_tail_from_features(
    params: Dict,
    static: FieldStatic,
    sigma_feat: Array,
    psig_enc: Optional[Array],
    h_extra: Array,
    ch_idx: Optional[Array] = None,
    compute_dtype=None,
) -> Array:
    """Signal network given precomputed per-point features (no gathers)."""
    if static.variant == "complex":
        dims = [
            SIGMA_FEAT_COMPLEX,
            static.encodings["dir"].n_output_dims,
            static.encodings["tx_dir"].n_output_dims,
            static.encodings["pos_sig"].n_output_dims,
            static.encodings["tx_pos_sig"].n_output_dims,
        ]
        slices = mlp.input_weight_slices(params["signal"], dims)
        h = (
            mlp._matmul(jax.nn.relu(sigma_feat), slices[0], compute_dtype)
            + mlp._matmul(psig_enc, slices[3], compute_dtype)
            + h_extra
        )
        return mlp.apply_tail(
            params["signal"], static.signal, h, compute_dtype=compute_dtype
        )
    dims = [
        SIGMA_FEAT_STANDARD,
        static.encodings["dir"].n_output_dims,
        static.encodings["tx"].n_output_dims,
    ] + ([static.emb_dim_sig] if static.sig_mode == "concat" else [])
    w_feat = mlp.input_weight_slices(params["signal"], dims)[0]
    h = mlp._matmul(sigma_feat, w_feat, compute_dtype) + h_extra
    return mlp.apply_tail(
        params["signal"], static.signal, h,
        ch_idx=ch_idx if static.sig_mode == "add" else None,
        compute_dtype=compute_dtype,
    )


def signal_from_parts(
    params: Dict,
    static: FieldStatic,
    sigma_feat: Array,
    pts: Optional[Array],
    h_extra: Array,
    ch_idx: Optional[Array] = None,
    compute_dtype=None,
) -> Array:
    """Per-point signal given factored first-layer context.

    sigma_feat: [..., 128/256] raw sigma features (the complex variant's
    relu convention is applied here); pts: [..., 3] in [−1,1] (complex
    only, for the pos_sig encoding; ignored otherwise); h_extra: the sum
    of per-ray and per-batch first-layer contributions from
    ``signal_context`` (+ bias), broadcastable against [..., W]; ch_idx:
    int32 broadcastable against the leading dims ("add" injection mode).
    Returns [..., signal_output_dim].
    """
    if static.variant == "complex":
        dims = [
            SIGMA_FEAT_COMPLEX,
            static.encodings["dir"].n_output_dims,
            static.encodings["tx_dir"].n_output_dims,
            static.encodings["pos_sig"].n_output_dims,
            static.encodings["tx_pos_sig"].n_output_dims,
        ]
        slices = mlp.input_weight_slices(params["signal"], dims)
        w_feat, w_psig = slices[0], slices[3]
        psig_enc = _enc(params, static, "pos_sig", _to01(pts))
        h = (
            mlp._matmul(jax.nn.relu(sigma_feat), w_feat, compute_dtype)
            + mlp._matmul(psig_enc, w_psig, compute_dtype)
            + h_extra
        )
        return mlp.apply_tail(
            params["signal"], static.signal, h, compute_dtype=compute_dtype
        )
    dims = [
        SIGMA_FEAT_STANDARD,
        static.encodings["dir"].n_output_dims,
        static.encodings["tx"].n_output_dims,
    ] + ([static.emb_dim_sig] if static.sig_mode == "concat" else [])
    w_feat = mlp.input_weight_slices(params["signal"], dims)[0]
    h = mlp._matmul(sigma_feat, w_feat, compute_dtype) + h_extra
    return mlp.apply_tail(
        params["signal"], static.signal, h,
        ch_idx=ch_idx if static.sig_mode == "add" else None,
        compute_dtype=compute_dtype,
    )
