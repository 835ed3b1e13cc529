"""Independent numpy oracle for the NIF forward passes.

Implements the hypernetwork math directly from the reference's documented
semantics (slicing order nif/model.py:253-300; chains :302-324, :849-877,
:936-951) without using any nif_tpu code, so golden tests catch agreement
bugs in either implementation.
"""
import numpy as np


def np_act(name):
    return {
        "swish": lambda x: x / (1.0 + np.exp(-x)),
        "relu": lambda x: np.maximum(x, 0),
        "tanh": np.tanh,
        "sine": np.sin,
        "linear": lambda x: x,
    }[name]


def unpack(wb, si, so, n, l, resblock=False):
    """wb: [B, po] -> per-layer weight tensors, reference slicing order."""
    m = 2 * l if resblock else l
    out = {}
    ofs = 0

    def take(k):
        nonlocal ofs
        seg = wb[:, ofs : ofs + k]
        ofs += k
        return seg

    out["w1"] = take(si * n).reshape(-1, si, n)
    out["wh"] = [take(n * n).reshape(-1, n, n) for _ in range(m)]
    out["wl"] = take(n * so).reshape(-1, n, so)
    out["b1"] = take(n)
    out["bh"] = [take(n) for _ in range(m)]
    out["bl"] = take(so)
    assert ofs == wb.shape[1]
    return out


def matvec(u, w):
    # [B, i], [B, i, j] -> [B, j]
    return np.einsum("ai,aij->aj", u, w)


def shapenet_vanilla(wb, x, si, so, n, l, activation):
    p = unpack(wb, si, so, n, l, False)
    act = np_act(activation)
    u = act(matvec(x, p["w1"]) + p["b1"])
    for i in range(l):
        u = act(matvec(u, p["wh"][i]) + p["bh"][i]) + u
    return matvec(u, p["wl"]) + p["bl"]


def shapenet_siren(wb, x, si, so, n, l, omega_0, resblock):
    p = unpack(wb, si, so, n, l, resblock)
    u = np.sin(omega_0 * matvec(x, p["w1"]) + p["b1"])
    if resblock:
        for i in range(l):
            h = np.sin(omega_0 * matvec(u, p["wh"][2 * i]) + p["bh"][2 * i])
            u = 0.5 * (
                u + np.sin(omega_0 * matvec(h, p["wh"][2 * i + 1]) + p["bh"][2 * i + 1])
            )
    else:
        for i in range(l):
            u = np.sin(omega_0 * matvec(u, p["wh"][i]) + p["bh"][i])
    return matvec(u, p["wl"]) + p["bl"]


def pnet_vanilla(params, t, nlayers, activation):
    act = np_act(activation)
    h = act(t @ np.asarray(params["first"]["w"]) + np.asarray(params["first"]["b"]))
    for i in range(nlayers):
        d = params[f"hidden_{i}"]["dense"]
        h = h + act(h @ np.asarray(d["w"]) + np.asarray(d["b"]))
    latent = h @ np.asarray(params["bottleneck"]["w"]) + np.asarray(
        params["bottleneck"]["b"]
    )
    po = latent @ np.asarray(params["last"]["w"]) + np.asarray(params["last"]["b"])
    return po, latent


def pnet_siren(params, t, nlayers, omega_0, resblock):
    h = np.sin(
        omega_0 * (t @ np.asarray(params["first"]["w"])) + np.asarray(params["first"]["b"])
    )
    for i in range(nlayers):
        p = params[f"hidden_{i}"]
        if resblock:
            hh = np.sin(omega_0 * (h @ np.asarray(p["w"])) + np.asarray(p["b"]))
            h = 0.5 * (
                h + np.sin(omega_0 * (hh @ np.asarray(p["w2"])) + np.asarray(p["b2"]))
            )
        else:
            h = np.sin(omega_0 * (h @ np.asarray(p["w"])) + np.asarray(p["b"]))
    latent = h @ np.asarray(params["bottleneck"]["w"]) + np.asarray(
        params["bottleneck"]["b"]
    )
    po = latent @ np.asarray(params["last"]["w"]) + np.asarray(params["last"]["b"])
    return po, latent
