"""Model registry: dispatch on RunConfig.model_kind.

Each model family exposes (init, loss_fn, make_window_spec) with identical
signatures so the chassis/CLI are model-agnostic (mirrors the reference's
ability to train either the AutoEncoder or the MfccInverter, SURVEY.md
§2.1)."""

from __future__ import annotations

from ae_wavenet_tpu.models import autoencoder, mfcc_inverter

_REGISTRY = {
    "autoencoder": autoencoder,
    "mfcc_inverter": mfcc_inverter,
}


def get(model_kind: str):
    try:
        return _REGISTRY[model_kind]
    except KeyError:
        raise ValueError(
            f"unknown model_kind {model_kind!r}; available: {sorted(_REGISTRY)}"
        ) from None
