"""Element-wise parity for the auxiliary Prenet/PostNet modules vs the
reference's (dead-code) definitions at text2vec/module.py:263-284 and
text2vec/subLayer.py:177-302."""

import jax.numpy as jnp
import numpy as np
import torch

from tests.ref_loader import load_ref_module
from wavthruvec_pytorch_tpu.models.extras import PostNet, Prenet


def test_prenet_parity_vs_reference():
    module = load_ref_module("text2vec", "module", "ref_module_prenet")
    torch.manual_seed(11)
    ref = module.Prenet(input_size=24, hidden_size=48, output_size=16)
    ref.eval()  # dropout off; ours: deterministic=True

    B, T = 3, 7
    rng = np.random.default_rng(11)
    x = rng.standard_normal((B, T, 24)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "fc1": {"Dense_0": {
            "kernel": sd["layer.fc1.linear_layer.weight"].T,
            "bias": sd["layer.fc1.linear_layer.bias"],
        }},
        "fc2": {"Dense_0": {
            "kernel": sd["layer.fc2.linear_layer.weight"].T,
            "bias": sd["layer.fc2.linear_layer.bias"],
        }},
    }
    y = Prenet(hidden_size=48, output_size=16).apply(
        {"params": params}, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)


def test_postnet_parity_vs_reference():
    sub = load_ref_module("text2vec", "subLayer", "ref_sublayer_postnet")
    torch.manual_seed(12)
    ref = sub.PostNet(n_mel_channels=20, postnet_embedding_dim=32,
                      postnet_kernel_size=5, postnet_n_convolutions=5)
    ref.eval()  # F.dropout inactive, BN running stats

    B, T = 2, 13
    rng = np.random.default_rng(12)
    x = rng.standard_normal((B, T, 20)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.from_numpy(x)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params, batch_stats = {}, {}
    for i in range(5):
        params[f"convolutions_{i}_conv"] = {"Conv_0": {
            "kernel": sd[f"convolutions.{i}.0.conv.weight"].transpose(2, 1, 0),
            "bias": sd[f"convolutions.{i}.0.conv.bias"],
        }}
        params[f"convolutions_{i}_bn"] = {"BatchNorm_0": {
            "scale": sd[f"convolutions.{i}.1.weight"],
            "bias": sd[f"convolutions.{i}.1.bias"],
        }}
        batch_stats[f"convolutions_{i}_bn"] = {"BatchNorm_0": {
            "mean": sd[f"convolutions.{i}.1.running_mean"],
            "var": sd[f"convolutions.{i}.1.running_var"],
        }}

    model = PostNet(n_mel_channels=20, postnet_embedding_dim=32)
    y = model.apply({"params": params, "batch_stats": batch_stats},
                    jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5)
