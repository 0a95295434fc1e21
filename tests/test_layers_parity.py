"""Numerical parity of building-block layers vs torch CPU references.

These tests copy *weights from torch modules we construct in the test* into
our flax params and assert forward-pass agreement — validating padding
conventions, transposed-conv semantics, weight/spectral-norm reparam and GRU
gate math against the exact torch ops the reference uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from wavthruvec_pytorch_tpu.models.layers import (
    BiGRU,
    Conv1d,
    SpectralNormConv1d,
    SpectralNormDense,
    WNConv1d,
    WNConv2d,
    WNConvTranspose1d,
)

ATOL = 2e-5


def _np(x):
    return x.detach().numpy()


def test_conv1d_matches_torch():
    torch.manual_seed(0)
    tconv = tnn.Conv1d(8, 16, kernel_size=9, padding=4, dilation=1)
    x = torch.randn(2, 8, 30)
    expected = _np(tconv(x)).transpose(0, 2, 1)  # -> [B, T, C]

    m = Conv1d(16, kernel_size=9, padding=4)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    params = m.init(jax.random.PRNGKey(0), xj)
    # torch weight [out, in, k] -> flax kernel [k, in, out]
    params = jax.tree_util.tree_map(lambda p: p, params)
    params["params"]["Conv_0"]["kernel"] = jnp.asarray(
        _np(tconv.weight).transpose(2, 1, 0)
    )
    params["params"]["Conv_0"]["bias"] = jnp.asarray(_np(tconv.bias))
    got = np.asarray(m.apply(params, xj))
    np.testing.assert_allclose(got, expected, atol=ATOL)


def test_grouped_strided_conv1d_matches_torch():
    torch.manual_seed(1)
    tconv = tnn.Conv1d(16, 32, kernel_size=41, stride=4, padding=20, groups=4)
    x = torch.randn(2, 16, 100)
    expected = _np(tconv(x)).transpose(0, 2, 1)

    m = Conv1d(32, kernel_size=41, stride=4, padding=20, groups=4)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    params = m.init(jax.random.PRNGKey(0), xj)
    params["params"]["Conv_0"]["kernel"] = jnp.asarray(
        _np(tconv.weight).transpose(2, 1, 0)
    )
    params["params"]["Conv_0"]["bias"] = jnp.asarray(_np(tconv.bias))
    got = np.asarray(m.apply(params, xj))
    np.testing.assert_allclose(got, expected, atol=ATOL)


def test_weightnorm_conv1d_matches_torch():
    torch.manual_seed(2)
    tconv = tnn.utils.weight_norm(tnn.Conv1d(4, 6, kernel_size=3, padding=2, dilation=2))
    x = torch.randn(2, 4, 20)
    expected = _np(tconv(x)).transpose(0, 2, 1)

    m = WNConv1d(6, kernel_size=3, padding=2, dilation=2)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    params = m.init(jax.random.PRNGKey(0), xj)
    # torch v [out, in, k] / g [out, 1, 1]
    params["params"]["v"] = jnp.asarray(_np(tconv.weight_v).transpose(2, 1, 0))
    params["params"]["g"] = jnp.asarray(_np(tconv.weight_g).transpose(2, 1, 0))
    params["params"]["bias"] = jnp.asarray(_np(tconv.bias))
    got = np.asarray(m.apply(params, xj))
    np.testing.assert_allclose(got, expected, atol=ATOL)


def test_weightnorm_convtranspose1d_matches_torch():
    """The upsampler core: ConvTranspose1d(k, u, padding=(k-u)//2)."""
    for (cin, cout, k, u) in [(8, 4, 11, 5), (8, 4, 8, 4), (6, 3, 4, 2)]:
        torch.manual_seed(3)
        tconv = tnn.utils.weight_norm(
            tnn.ConvTranspose1d(cin, cout, k, u, padding=(k - u) // 2)
        )
        x = torch.randn(2, cin, 17)
        expected = _np(tconv(x)).transpose(0, 2, 1)
        assert expected.shape[1] == 17 * u  # exact x-u upsampling

        m = WNConvTranspose1d(cout, kernel_size=k, stride=u, padding=(k - u) // 2)
        xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
        params = m.init(jax.random.PRNGKey(0), xj)
        # torch ConvTranspose weight_v [in, out, k] -> flax (k, in, out)
        params["params"]["v"] = jnp.asarray(_np(tconv.weight_v).transpose(2, 0, 1))
        params["params"]["g"] = jnp.asarray(_np(tconv.weight_g).transpose(2, 0, 1))
        params["params"]["bias"] = jnp.asarray(_np(tconv.bias))
        got = np.asarray(m.apply(params, xj))
        np.testing.assert_allclose(got, expected, atol=ATOL)


def test_weightnorm_conv2d_matches_torch():
    torch.manual_seed(4)
    tconv = tnn.utils.weight_norm(tnn.Conv2d(1, 8, (5, 1), (3, 1), padding=(2, 0)))
    x = torch.randn(2, 1, 30, 13)
    expected = _np(tconv(x)).transpose(0, 2, 3, 1)  # NCHW -> NHWC

    m = WNConv2d(8, kernel_size=(5, 1), strides=(3, 1), padding=(2, 0))
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    params = m.init(jax.random.PRNGKey(0), xj)
    params["params"]["v"] = jnp.asarray(_np(tconv.weight_v).transpose(2, 3, 1, 0))
    params["params"]["g"] = jnp.asarray(_np(tconv.weight_g).transpose(2, 3, 1, 0))
    params["params"]["bias"] = jnp.asarray(_np(tconv.bias))
    got = np.asarray(m.apply(params, xj))
    np.testing.assert_allclose(got, expected, atol=ATOL)


def test_spectral_norm_dense_matches_torch():
    torch.manual_seed(5)
    tlin = tnn.utils.spectral_norm(tnn.Linear(12, 10))
    x = torch.randn(4, 12)

    m = SpectralNormDense(10)
    xj = jnp.asarray(x.numpy())
    variables = m.init(jax.random.PRNGKey(0), xj)
    params = variables["params"]
    params["kernel"] = jnp.asarray(_np(tlin.weight_orig).T)
    params["bias"] = jnp.asarray(_np(tlin.bias))
    # .copy(): jnp.asarray can alias the torch buffer on CPU and torch's
    # forward mutates weight_u in place.
    spectral = {
        "u": jnp.asarray(_np(tlin.weight_u).copy()),
        "v": jnp.asarray(_np(tlin.weight_v).copy()),
    }

    # torch updates u in-place on each training forward; run both once and
    # compare outputs + updated u.
    expected = _np(tlin(x))
    got, mutated = m.apply(
        {"params": params, "spectral": spectral},
        xj,
        mutable=["spectral"],
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(mutated["spectral"]["u"]),
        _np(tlin.weight_u),
        atol=1e-4,
    )


def test_spectral_norm_conv_matches_torch():
    torch.manual_seed(6)
    tconv = tnn.utils.spectral_norm(tnn.Conv1d(4, 8, 15, 1, padding=7))
    x = torch.randn(2, 4, 50)

    m = SpectralNormConv1d(8, kernel_size=15, stride=1, padding=7)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    variables = m.init(jax.random.PRNGKey(0), xj)
    params = variables["params"]
    params["kernel"] = jnp.asarray(_np(tconv.weight_orig).transpose(2, 1, 0))
    params["bias"] = jnp.asarray(_np(tconv.bias))
    spectral = {
        "u": jnp.asarray(_np(tconv.weight_u).copy()),
        "v": jnp.asarray(_np(tconv.weight_v).copy()),
    }

    expected = _np(tconv(x)).transpose(0, 2, 1)
    got, _ = m.apply(
        {"params": params, "spectral": spectral}, xj, mutable=["spectral"]
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_bigru_matches_torch():
    torch.manual_seed(7)
    H, C = 6, 5
    tgru = tnn.GRU(C, H, 1, batch_first=True, bidirectional=True)
    x = torch.randn(3, 11, C)
    expected, _ = tgru(x)
    expected = _np(expected)

    m = BiGRU(H)
    xj = jnp.asarray(x.numpy())
    params = m.init(jax.random.PRNGKey(0), xj)["params"]
    # torch weight_ih_l0: [3H, C] (r|z|n) -> ours (C, 3H)
    params["fwd_w_ih"] = jnp.asarray(_np(tgru.weight_ih_l0).T)
    params["fwd_w_hh"] = jnp.asarray(_np(tgru.weight_hh_l0).T)
    params["fwd_b_ih"] = jnp.asarray(_np(tgru.bias_ih_l0))
    params["fwd_b_hh"] = jnp.asarray(_np(tgru.bias_hh_l0))
    params["bwd_w_ih"] = jnp.asarray(_np(tgru.weight_ih_l0_reverse).T)
    params["bwd_w_hh"] = jnp.asarray(_np(tgru.weight_hh_l0_reverse).T)
    params["bwd_b_ih"] = jnp.asarray(_np(tgru.bias_ih_l0_reverse))
    params["bwd_b_hh"] = jnp.asarray(_np(tgru.bias_hh_l0_reverse))
    got = np.asarray(m.apply({"params": params}, xj))
    np.testing.assert_allclose(got, expected, atol=ATOL)


def test_gru_custom_vjp_matches_autodiff():
    """gru_direction's hand-written backward (weight grads hoisted out of
    the scan as whole-sequence einsums) must equal plain autodiff through
    the scan core, for every input/parameter gradient."""
    from wavthruvec_pytorch_tpu.models.layers import (
        _gru_fwd_core,
        gru_direction,
    )

    rng = np.random.default_rng(0)
    B, T, C, H = 3, 17, 11, 7
    xs = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    args = (
        xs,
        jnp.asarray(rng.standard_normal((C, 3 * H)) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.3, jnp.float32),
        jnp.asarray(rng.standard_normal(3 * H) * 0.1, jnp.float32),
        jnp.asarray(rng.standard_normal(3 * H) * 0.1, jnp.float32),
    )
    dys = jnp.asarray(rng.standard_normal((B, T, H)), jnp.float32)

    def ref(*a):  # plain autodiff through the scan core (stacked to D=1)
        return _gru_fwd_core(*(x[None] for x in a))[0][0]

    np.testing.assert_array_equal(
        np.asarray(gru_direction(*args)), np.asarray(ref(*args))
    )
    g_ref = jax.grad(lambda *a: jnp.vdot(ref(*a), dys),
                     argnums=tuple(range(5)))(*args)
    g_new = jax.grad(lambda *a: jnp.vdot(gru_direction(*a), dys),
                     argnums=tuple(range(5)))(*args)
    for name, a, b in zip(["dxs", "dw_ih", "dw_hh", "db_ih", "db_hh"],
                          g_ref, g_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, err_msg=name)


def test_bigru_pallas_impl_matches_scan():
    """BiGRU(impl="pallas") (ops/gru_pallas.py forward kernel, interpret mode
    on CPU) matches the scan implementation within bf16-weight rounding, in
    both the forward values and the custom-VJP gradients."""
    from wavthruvec_pytorch_tpu.models.layers import BiGRU
    from wavthruvec_pytorch_tpu.ops.gru_pallas import gru_pallas_supported

    assert gru_pallas_supported(2, 2, 128)
    assert not gru_pallas_supported(2, 2, 72)  # lane-alignment gate
    assert not gru_pallas_supported(2, 512, 1024)  # VMEM budget gate

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 33, 48)), jnp.float32) * 0.5
    m_scan = BiGRU(hidden=128)
    m_pal = BiGRU(hidden=128, impl="pallas")
    v = m_scan.init(jax.random.PRNGKey(0), x)
    y0 = np.asarray(m_scan.apply(v, x))
    y1 = np.asarray(m_pal.apply(v, x))
    np.testing.assert_allclose(y1, y0, atol=2e-3)

    g0 = jax.grad(lambda vv: jnp.sum(jnp.tanh(m_scan.apply(vv, x))))(v)
    g1 = jax.grad(lambda vv: jnp.sum(jnp.tanh(m_pal.apply(vv, x))))(v)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        rel = float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
        assert rel < 5e-3, rel


def test_batchnorm_matches_torch_train_and_eval():
    torch.manual_seed(8)
    from wavthruvec_pytorch_tpu.models.layers import BatchNorm

    tbn = tnn.BatchNorm1d(5)
    x = torch.randn(4, 5, 9)  # [B, C, T]
    tbn.train()
    expected_train = _np(tbn(x)).transpose(0, 2, 1)

    m = BatchNorm(use_running_average=False)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 1))
    variables = m.init(jax.random.PRNGKey(0), xj)
    got, mutated = m.apply(variables, xj, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), expected_train, atol=1e-5)
    # running stats after one step match torch's (momentum 0.1)
    bs = mutated["batch_stats"]["BatchNorm_0"]
    np.testing.assert_allclose(
        np.asarray(bs["mean"]), _np(tbn.running_mean), atol=1e-5
    )
    # torch running_var uses the *unbiased* batch var; flax uses biased.
    n = 4 * 9
    np.testing.assert_allclose(
        np.asarray(bs["var"]) * 1.0,
        ((_np(tbn.running_var) - 0.9) * (n - 1) / n) + 0.9,
        atol=1e-5,
    )
