"""Melception (Inception3-for-mel FID backbone) parity vs an executed torch
reference with torchvision-identical state_dict keys.

The reference class (ldm/modules/losses_audio/vggishish/train_melception.py:
20-34) is torchvision's Inception3 with a 1-channel stem and the two stem
maxpools removed. torchvision is not installed here, so the executable
reference is tests/torch_inception_ref.py — a clean-room torch
implementation of the same public architecture whose state_dict keys match
torchvision's exactly (so the importer path is the one a real released
melception checkpoint would take).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from maa3_tpu.models.melception import (MelceptionConfig, melception_init,
                                        melception_apply,
                                        melception_param_count)
from maa3_tpu.torch_import import melception_from_torch

N_CLASSES = 7


@pytest.fixture(scope="module")
def torch_ref_and_params():
    import torch
    from torch_inception_ref import MelceptionRef
    torch.manual_seed(0)
    ref = MelceptionRef(num_classes=N_CLASSES)
    # nontrivial BN running stats so eval-mode normalization is exercised
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    ref.eval()
    params = melception_from_torch(
        {k: v.numpy() for k, v in ref.state_dict().items()})
    return ref, params


def test_melception_logits_and_features_parity(torch_ref_and_params):
    import torch
    ref, params = torch_ref_and_params
    mel = np.random.RandomState(0).randn(2, 80, 96).astype(np.float32) * 0.5
    with torch.no_grad():
        logits_t, feats_t, _ = ref(torch.tensor(mel), return_features=True)
    logits, feats = melception_apply(
        params, MelceptionConfig(num_classes=N_CLASSES), jnp.asarray(mel),
        return_features=True)
    np.testing.assert_allclose(np.asarray(feats), feats_t.numpy(),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(logits), logits_t.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_melception_aux_parity(torch_ref_and_params):
    import torch
    ref, params = torch_ref_and_params
    mel = np.random.RandomState(1).randn(1, 80, 96).astype(np.float32) * 0.5
    # the ref forward only computes aux in train mode (which would switch BN
    # to batch stats); grab the Mixed_6e activation in eval mode instead and
    # run its aux head directly
    captured = {}
    h = ref.Mixed_6e.register_forward_hook(
        lambda m, i, o: captured.__setitem__("x", o))
    with torch.no_grad():
        ref(torch.tensor(mel))
        aux_t = ref.AuxLogits(captured["x"])
    h.remove()
    _, _, aux = melception_apply(
        params, MelceptionConfig(num_classes=N_CLASSES), jnp.asarray(mel),
        return_features=True, return_aux=True)
    np.testing.assert_allclose(np.asarray(aux), aux_t.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_melception_random_init_smoke():
    # random init (no BN running stats -> batch-stats path), full class count
    cfg = MelceptionConfig()
    params = melception_init(jax.random.PRNGKey(0), cfg)
    n = melception_param_count(params)
    assert n > 20e6  # Inception3-class model (~24M at 309 classes)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 96))
    logits, feats, aux = melception_apply(params, cfg, mel,
                                          return_features=True,
                                          return_aux=True)
    assert logits.shape == (2, cfg.num_classes)
    assert feats.shape == (2, 2048)
    assert aux.shape == (2, cfg.num_classes)
    assert np.isfinite(np.asarray(logits)).all()
