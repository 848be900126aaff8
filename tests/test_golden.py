"""Frozen golden-logits regression test.

The fixture (tests/data/) was generated once from a PyTorch STLT through the
checkpoint converter (generation script documented in the file's git commit).
Unlike the live torch-oracle parity tests, this one needs NO torch at
runtime: it pins the model semantics + converter output against committed
bytes, so silent numeric drift in future refactors fails loudly.
"""

import os

import jax
import numpy as np
from flax import serialization

from stlt_tpu.models import models_factory
from tests.test_stlt_parity import small_config

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def test_golden_stlt_logits():
    blob = np.load(os.path.join(DATA, "golden_stlt_io.npz"))
    inputs = {k[3:]: blob[k] for k in blob.files if k.startswith("in_")}
    expected = blob["logits"]

    cfg = small_config()
    model = models_factory["stlt"](cfg)
    template = model.init(jax.random.PRNGKey(0), inputs)["params"]
    with open(os.path.join(DATA, "golden_stlt_params.msgpack"), "rb") as f:
        params = serialization.from_bytes(template, f.read())
    got = np.asarray(model.apply({"params": params}, inputs)["stlt"])
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-5)
