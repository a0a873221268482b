"""NumPy oracles for the PEFT math.

These are independent transcriptions of the reference formulas (cited per
function) written directly from the math, used to validate the JAX kernels.
All computations are float64 NumPy for a trustworthy reference value.
"""

from __future__ import annotations

import numpy as np


def np_kron_sum(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """sum_p kron(a[p], b[p]) — oracle for model.py:406-417."""
    return sum(np.kron(a[p], b[p]) for p in range(a.shape[0]))


def np_layer_norm(x, scale, bias, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def np_quick_gelu(x):
    return x / (1.0 + np.exp(-1.702 * x))


def np_gelu_new(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def np_kadaptation_delta(x_nbc, shared, layer, n_head, matrix):
    """Oracle for model.py:563-584 + the :796 scramble.

    x_nbc: (N, B, C) hidden states (reference layout).  Returns the
    (B*H, N, hd) delta with kdropout disabled (eval mode).
    """
    N, B, C = x_nbc.shape
    hd = C // n_head
    scale = 128 / 4 * 5
    wq = np.einsum("pir,prj->pij", layer["q_left"], layer["q_right"])
    if matrix == "q":
        rule = np.einsum("pir,prj->pij", shared["phm_rule1_left"], shared["phm_rule1_right"])
    else:
        rule = np.einsum("pir,prj->pij", shared["phm_rule2_left"], shared["phm_rule2_right"])
    h = np_kron_sum(rule, wq)  # Wq used for BOTH branches (quirk #1)
    delta = x_nbc @ h * scale + layer["b"]
    return delta.reshape(B * n_head, N, hd)


def np_lora_delta(x_nbc, a, b_mat, n_head):
    """Oracle for lora_model.py:490-514 + :729 scramble. a: (in,r), b: (r,out)."""
    N, B, C = x_nbc.shape
    hd = C // n_head
    delta = (x_nbc @ a) @ b_mat * (128 / 4)
    return delta.reshape(B * n_head, N, hd)


def np_attention_with_delta(x_nbc, w_in, b_in, w_out, b_out, n_head, q_delta=None, v_delta=None):
    """Oracle for the reference custom MHA forward (model.py:612-834), eval
    mode, no mask.  x_nbc: (N, B, C); w_in: (3C, C) torch layout; returns
    (N, B, C)."""
    N, B, C = x_nbc.shape
    hd = C // n_head
    qkv = x_nbc @ w_in.T + b_in
    q, k, v = qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :]

    def split_heads(t):  # (N, B, C) -> (B*H, N, hd): view(N, B*H, hd).transpose(0,1)
        return t.reshape(N, B * n_head, hd).transpose(1, 0, 2)

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    q = q / np.sqrt(hd)
    if q_delta is not None:
        q = q + q_delta
    if v_delta is not None:
        v = v + v_delta
    logits = q @ k.transpose(0, 2, 1)
    logits = logits - logits.max(-1, keepdims=True)
    probs = np.exp(logits)
    probs = probs / probs.sum(-1, keepdims=True)
    out = probs @ v  # (B*H, N, hd)
    out = out.transpose(1, 0, 2).reshape(N * B, C)  # model.py:815
    out = out @ w_out.T + b_out
    return out.reshape(N, B, C)


def np_phm_linear(x, w_left, w_right, rule, bias):
    """Oracle for compacter_model.py:302-308."""
    w = np.einsum("pir,prj->pij", w_left, w_right)
    h = np_kron_sum(rule, w)
    return x @ h + bias


def np_adapter_block(m, norm_scale, norm_bias, down_k, down_b, up_k, up_b):
    """Oracle for adapter_model.py:264-282 with residual_before_ln=True."""
    h = np_layer_norm(m, norm_scale, norm_bias)
    h = np.maximum(h @ down_k + down_b, 0.0)
    up = h @ up_k + up_b
    return up + m


def np_compacter_block(m, norm_scale, norm_bias, layer, rule):
    """Oracle for compacter_model.py:432-448."""
    h = np_layer_norm(m, norm_scale, norm_bias)
    h = np_phm_linear(h, layer["down_w_left"], layer["down_w_right"], rule, layer["down_b"])
    h = np_gelu_new(h)
    h = np_phm_linear(h, layer["up_w_left"], layer["up_w_right"], rule, layer["up_b"])
    return h + m
