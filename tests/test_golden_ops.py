"""Op parity vs COMMITTED golden fixtures (torch-independent).

The fixtures were generated once from the torch oracle
(tests/oracle/make_golden.py) and committed — this suite runs without
torch and guards against oracle/torch version drift (SURVEY.md section 4
"golden-file fixtures committed")."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from text_segmentation_image_inpainting_tpu.ops import (
    dilate_mask,
    partial_conv2d,
    resize_bilinear,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures", "golden_ops.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(FIX)


def test_golden_partial_conv_k3_grouped(golden):
    y, nm = partial_conv2d(
        jnp.asarray(golden["pc3_x"]), jnp.asarray(golden["pc3_m"]),
        jnp.asarray(golden["pc3_w"]), jnp.asarray(golden["pc3_b"]),
        group_sizes=(4, 6), padding=1,
    )
    np.testing.assert_allclose(np.asarray(y), golden["pc3_y"], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(nm), golden["pc3_nm"])


def test_golden_partial_conv_k7_stride2(golden):
    y, nm = partial_conv2d(
        jnp.asarray(golden["pc7_x"]), jnp.asarray(golden["pc7_m"]),
        jnp.asarray(golden["pc7_w"]), None, stride=2, padding=3,
    )
    np.testing.assert_allclose(np.asarray(y), golden["pc7_y"], rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(nm), golden["pc7_nm"])


def test_golden_resize(golden):
    x = jnp.asarray(golden["rs_x"])
    np.testing.assert_allclose(
        np.asarray(resize_bilinear(x, (18, 26))), golden["rs_up"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(resize_bilinear(x, (5, 7))), golden["rs_dn"], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(resize_bilinear(x, (18, 26), align_corners=True)),
        golden["rs_ac"], rtol=1e-4, atol=1e-5,
    )


def test_golden_dilate(golden):
    got = dilate_mask(jnp.asarray(golden["di_m"]), radius=2)
    np.testing.assert_array_equal(np.asarray(got), golden["di_out"])
