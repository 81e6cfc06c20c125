"""Inference path tests: whole vs slide consistency, flip averaging
(reference behavior: encoder_decoder.py:1068-1212)."""
import jax
import jax.numpy as jnp
import numpy as np

from s4former_tpu.models.segmentors.inference import (inference, predict,
                                                      slide_inference,
                                                      whole_inference)


def _linear_model(num_classes=4):
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (3, num_classes))

    def apply_fn(img):
        # pixelwise linear classifier: translation-invariant, so slide and
        # whole must agree exactly
        return jnp.einsum('bhwc,cn->bhwn', img, w)

    return apply_fn


def test_slide_equals_whole_for_pixelwise_model():
    apply_fn = _linear_model()
    img = jnp.asarray(np.random.RandomState(0).randn(2, 96, 96, 3),
                      jnp.float32)
    whole = whole_inference(apply_fn, img)
    slide = slide_inference(apply_fn, img, 4, crop_size=(64, 64),
                            stride=(32, 32))
    np.testing.assert_allclose(np.asarray(slide), np.asarray(whole),
                               rtol=1e-5, atol=1e-5)


def test_slide_covers_all_pixels():
    # a model returning ones: count-normalization must give exactly 1
    def ones_fn(img):
        return jnp.ones(img.shape[:3] + (2,), jnp.float32)

    img = jnp.zeros((1, 100, 90, 3))
    out = slide_inference(ones_fn, img, 2, crop_size=(64, 64),
                          stride=(48, 48))
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_flip_averaging_symmetric():
    apply_fn = _linear_model()
    img = jnp.asarray(np.random.RandomState(1).randn(1, 32, 32, 3),
                      jnp.float32)
    probs = inference(apply_fn, img, 4, flip=True)
    probs_of_flipped = inference(apply_fn, img[:, :, ::-1, :], 4, flip=True)
    np.testing.assert_allclose(np.asarray(probs),
                               np.asarray(probs_of_flipped[:, :, ::-1, :]),
                               rtol=1e-5, atol=1e-6)


def test_predict_outputs_labels():
    apply_fn = _linear_model()
    img = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 3),
                      jnp.float32)
    seg = predict(apply_fn, img, 4)
    assert seg.shape == (1, 32, 32)
    assert seg.dtype == jnp.int32
    assert int(seg.max()) < 4


def test_whole_resizes_to_out_hw():
    apply_fn = _linear_model()
    img = jnp.zeros((1, 32, 32, 3))
    out = whole_inference(apply_fn, img, out_hw=(50, 60))
    assert out.shape == (1, 50, 60, 4)
