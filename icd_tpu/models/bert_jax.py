"""JAX BERT encoder: the frozen bert-base forward, on the TPU.

The reference runs bert-base-uncased on the HOST inside its training hot
loop, one caption at a time (reference: models/attention.py:166-215).
tools/bench_bert.py measured that host forward at ~3.5 s/batch-32 on
this container's CPU — 15x the whole attention train step — so the
TPU-native design moves the transformer stack onto the chip: this module
is a pure-JAX BERT encoder forward over a pytree converted from any
torch ``transformers.BertModel`` (``bert_from_torch``), jitted per
sequence-length bucket. The wordpiece→word alignment stays host-side
string logic (models/bert_embed.py), exactly like the reference.

Numerics: standard HF BERT semantics — word+position+token-type
embeddings, LayerNorm eps from the model config, erf GeLU, 1/sqrt(d)
scaled dot-product attention with additive -1e9 padding mask. Matches
the torch forward to f32 tolerance on CPU (tests/test_bert_jax.py); on
TPU the MXU's default f32->bf16 operand truncation applies (training
inputs, not a parity surface — inference/beam still uses the decoder's
learned table, reference gen_captions.py:19).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np


def _t(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _lin(sd, prefix):
    # torch Linear stores (out, in); we keep (in, out).
    return {"w": _t(sd[prefix + ".weight"]).T, "b": _t(sd[prefix + ".bias"])}


def _ln(sd, prefix):
    return {"scale": _t(sd[prefix + ".weight"]),
            "bias": _t(sd[prefix + ".bias"])}


def bert_from_torch(model):
    """transformers.BertModel -> (params pytree, config dict)."""
    sd = model.state_dict()
    cfg = model.config
    n_layers = cfg.num_hidden_layers
    layers = []
    for i in range(n_layers):
        p = "encoder.layer.{}.".format(i)
        layers.append({
            "q": _lin(sd, p + "attention.self.query"),
            "k": _lin(sd, p + "attention.self.key"),
            "v": _lin(sd, p + "attention.self.value"),
            "o": _lin(sd, p + "attention.output.dense"),
            "ln_att": _ln(sd, p + "attention.output.LayerNorm"),
            "ffn_in": _lin(sd, p + "intermediate.dense"),
            "ffn_out": _lin(sd, p + "output.dense"),
            "ln_out": _ln(sd, p + "output.LayerNorm"),
        })
    params = {
        "word": _t(sd["embeddings.word_embeddings.weight"]),
        "pos": _t(sd["embeddings.position_embeddings.weight"]),
        "type": _t(sd["embeddings.token_type_embeddings.weight"]),
        "ln_emb": _ln(sd, "embeddings.LayerNorm"),
        "layers": layers,
    }
    config = {
        "num_heads": cfg.num_attention_heads,
        "ln_eps": float(getattr(cfg, "layer_norm_eps", 1e-12)),
    }
    return params, config


def quantize_bert_params(params):
    """f32 BERT pytree -> W8A8 variant: each Linear's (in, out) weight
    becomes per-output-channel int8 + f32 scale (ops/qlinear.py), biases
    and LayerNorm/embedding tables stay f32.

    Rationale: the 12 encoder layers are matmul-dominated (q/k/v/o at
    768x768, FFN at 768x3072/3072x768 — ~97% of layer FLOPs), the v5e
    MXU runs s8xs8 at 2x bf16 throughput, and weight HBM traffic halves.
    Activations are quantized dynamically per row at trace time inside
    ``_apply_lin`` (LayerNormed inputs are well-ranged, and the rows are
    (B*L,)-sized so the abs-max pass is noise). The attention einsums
    (softmax scores/context) stay float: they are L x L-shaped, tiny,
    and precision-critical. This is a TPU-native extension — the
    reference runs f32 torch BERT on the host inside its train loop
    (reference: models/attention.py:96-100, 166-215)."""
    from ..ops.qlinear import quantize_linear

    def q(lin):
        wq, ws = quantize_linear(jnp.asarray(lin["w"]))
        return {"wq": np.asarray(wq), "ws": np.asarray(ws),
                "b": lin["b"]}

    out = {k: params[k] for k in ("word", "pos", "type", "ln_emb")}
    out["layers"] = [
        {"q": q(l["q"]), "k": q(l["k"]), "v": q(l["v"]), "o": q(l["o"]),
         "ln_att": l["ln_att"], "ffn_in": q(l["ffn_in"]),
         "ffn_out": q(l["ffn_out"]), "ln_out": l["ln_out"]}
        for l in params["layers"]]
    return out


def _apply_lin(x, lin):
    """x @ w + b, dispatching on quantized vs f32 weights. Identical
    quantize_rows subgraphs over the same hidden (q/k/v share an input)
    are CSE'd by XLA, so the dynamic activation quant costs one pass."""
    if "wq" in lin:
        from ..ops.qlinear import qmatmul

        flat = x.reshape(-1, x.shape[-1])
        out = qmatmul(flat, lin["wq"], lin["ws"]) + lin["b"]
        return out.reshape(x.shape[:-1] + (out.shape[-1],))
    return x @ lin["w"] + lin["b"]


def _layer_norm(x, ln, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * ln["scale"] + ln["bias"]


def bert_encoder_forward(params, input_ids, attention_mask, num_heads=12,
                         ln_eps=1e-12):
    """(B, L) ids + (B, L) {0,1} mask -> (B, L, H) last hidden states."""
    b, length = input_ids.shape
    hidden = (params["word"][input_ids]
              + params["pos"][jnp.arange(length)][None]
              + params["type"][jnp.zeros((b, length), jnp.int32)])
    hidden = _layer_norm(hidden, params["ln_emb"], ln_eps)

    # Additive mask: padded keys pushed to -1e9 before softmax.
    bias = (1.0 - attention_mask.astype(hidden.dtype))[:, None, None, :]
    bias = bias * -1e9

    h_dim = hidden.shape[-1]
    head_dim = h_dim // num_heads
    scale = 1.0 / math.sqrt(head_dim)

    def heads(x):  # (B, L, H) -> (B, heads, L, head_dim)
        return x.reshape(b, length, num_heads, head_dim).transpose(
            0, 2, 1, 3)

    for layer in params["layers"]:
        q = heads(_apply_lin(hidden, layer["q"]))
        k = heads(_apply_lin(hidden, layer["k"]))
        v = heads(_apply_lin(hidden, layer["v"]))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale + bias
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, length, h_dim)
        att_out = _apply_lin(ctx, layer["o"])
        hidden = _layer_norm(hidden + att_out, layer["ln_att"], ln_eps)

        inter = jax.nn.gelu(
            _apply_lin(hidden, layer["ffn_in"]), approximate=False)
        ffn_out = _apply_lin(inter, layer["ffn_out"])
        hidden = _layer_norm(hidden + ffn_out, layer["ln_out"], ln_eps)

    return hidden


def bert_aligned_forward(params, input_ids, attention_mask, seg, n_words,
                         num_heads=12, ln_eps=1e-12):
    """BERT forward + on-device piece->word alignment.

    ``seg`` is (B, L) int32: the word index each wordpiece belongs to
    (-1 for pieces the host alignment walk never consumed, including
    padding). The reference sums piece embeddings per word on the host
    (reference: models/attention.py:190-215); here the sum is a
    segment-sum on device so the (B, L, H) hidden states never cross
    the host link — only the tiny int arrays do.
    """
    hidden = bert_encoder_forward(params, input_ids, attention_mask,
                                  num_heads=num_heads, ln_eps=ln_eps)
    # -1 (unconsumed/padding) routes to a dump row that is sliced off;
    # words that received no pieces are left at zero, matching the
    # host path's zeros-row fallback (bert_embed.align_pieces_to_words).
    safe = jnp.where(seg < 0, n_words, seg)
    aligned = jax.vmap(
        lambda h, s: jax.ops.segment_sum(h, s, num_segments=n_words + 1)
    )(hidden, safe)
    return aligned[:, :n_words]


class JaxBert:
    """Device-resident BERT forward with per-bucket jitted programs.

    Drop-in for the torch model inside BertCaptionEmbedder's
    ``_embed_texts``: call with (B, L) int64/int32 ids + mask, get
    (B, L, H) float32 hidden states back on host. Sequence lengths are
    bucketed to multiples of ``bucket`` so XLA compiles a handful of
    shapes, not one per batch max.

    ``aligned`` fuses the piece->word segment-sum into the same device
    program and returns a DEVICE array, so the embeddings feed the
    train step without a host round-trip (the dev tunnel ships ~2 MB
    per step otherwise; real hosts still save the PCIe hop).
    """

    def __init__(self, torch_model, bucket=16, int8=False):
        self.params, cfg = bert_from_torch(torch_model)
        if int8:
            self.params = quantize_bert_params(self.params)
        self.params = jax.tree_util.tree_map(jnp.asarray, self.params)
        self.bucket = bucket
        self._fwd = jax.jit(
            lambda p, ids, mask: bert_encoder_forward(
                p, ids, mask, num_heads=cfg["num_heads"],
                ln_eps=cfg["ln_eps"]))
        self._fwd_aligned = jax.jit(
            lambda p, ids, mask, seg, n_words: bert_aligned_forward(
                p, ids, mask, seg, n_words,
                num_heads=cfg["num_heads"], ln_eps=cfg["ln_eps"]),
            static_argnums=(4,))

    def _pad(self, arrs, fill):
        length = arrs[0].shape[1]
        padded = max(self.bucket,
                     ((length + self.bucket - 1) // self.bucket)
                     * self.bucket)
        if padded == length:
            return arrs
        return [np.pad(a, ((0, 0), (0, padded - length)),
                       constant_values=f)
                for a, f in zip(arrs, fill)]

    def __call__(self, ids, mask):
        ids = np.asarray(ids, np.int32)
        mask = np.asarray(mask, np.int32)
        length = ids.shape[1]
        ids, mask = self._pad([ids, mask], [0, 0])
        out = self._fwd(self.params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out[:, :length]).astype(np.float32)

    def aligned(self, ids, mask, seg, n_words):
        """(B, L) ids/mask/seg -> (B, n_words, H) device array.

        ``n_words`` is a static arg of the jitted program, so it is
        bucketed like the sequence length — the attention loader pads
        captions to the batch max (reference parity, pad_to_multiple=0),
        so the raw value takes tens of distinct values per epoch and
        each would recompile the whole encoder (minutes per shape over
        the remote tunnel). Extra word rows sum only padding/-1 pieces
        (zeros) and are sliced off here."""
        ids = np.asarray(ids, np.int32)
        mask = np.asarray(mask, np.int32)
        seg = np.asarray(seg, np.int32)
        ids, mask, seg = self._pad([ids, mask, seg], [0, 0, -1])
        n_words = int(n_words)
        nw_pad = max(self.bucket,
                     ((n_words + self.bucket - 1) // self.bucket)
                     * self.bucket)
        out = self._fwd_aligned(self.params, jnp.asarray(ids),
                                jnp.asarray(mask), jnp.asarray(seg),
                                nw_pad)
        return out[:, :n_words]
