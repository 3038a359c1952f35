"""Minimal tf.contrib.slim implementation over tf.compat.v1 — just enough to
BUILD AND RUN the reference's own RON graph code (nets/ron_vgg_320.py
`ron_net_reducedfc` + its head modules) on TF 2.x, for:

  1. whole-network forward parity fixtures (reference graph vs our flax RON
     on identical weights), and
  2. a MEASURED reference inference baseline for bench.py.

Inference-only: weight initializers/regularizers are accepted and ignored
(weights are injected from outside), and the defaults BAKE IN what the
reference's `ron_arg_scope` would set (ReLU activation, SAME padding,
BN eps 1e-5 / scale=True, ref: nets/ron_vgg_320.py:595-629). `arg_scope`
itself is also implemented (functional override stack) so code that opens
scopes still works.

Variable naming follows real slim exactly ('weights', 'biases',
'BatchNorm/{gamma,beta,moving_mean,moving_variance}', repeat ->
'conv1/conv1_1'), so the exported graph doubles as a name-fidelity oracle
for importing the reference's published checkpoints
(ron_tensorflow_tpu/train/tf_checkpoint.py `slim_ron_to_flat`).

No reference code is copied — this reimplements the (public-API) slim layer
contracts the reference calls.
"""

from __future__ import annotations

import contextlib
import threading
import types

_STACK = threading.local()


def _overrides(key):
    out = {}
    for frame in getattr(_STACK, "frames", []):
        if key in frame:
            out.update(frame[key])
    return out


def build_slim(tf1) -> types.ModuleType:
    """Returns a module usable as `tf.contrib.slim` for the reference's RON
    graph code."""
    slim = types.ModuleType("slim_shim")

    @contextlib.contextmanager
    def arg_scope(list_ops_or_scope, **kwargs):
        if isinstance(list_ops_or_scope, dict):  # re-entered stored scope
            frames = getattr(_STACK, "frames", [])
            _STACK.frames = frames + [dict(list_ops_or_scope)]
            try:
                yield dict(list_ops_or_scope)
            finally:
                _STACK.frames = frames
            return
        frame = {id(op): dict(kwargs) for op in list_ops_or_scope}
        frames = getattr(_STACK, "frames", [])
        _STACK.frames = frames + [frame]
        try:
            yield frame
        finally:
            _STACK.frames = frames

    def _get(kw, overrides, name, default):
        if name in kw:
            return kw.pop(name)
        return overrides.get(name, default)

    def batch_norm(inputs, **kw):
        ov = _overrides(id(slim.batch_norm))
        activation_fn = _get(kw, ov, "activation_fn", None)
        epsilon = _get(kw, ov, "epsilon", 1e-5)
        scale = _get(kw, ov, "scale", True)
        _get(kw, ov, "is_training", False)  # inference-only shim
        _get(kw, ov, "decay", 0.997)
        _get(kw, ov, "fused", True)
        _get(kw, ov, "data_format", "NHWC")
        c = int(inputs.shape[-1])
        with tf1.variable_scope("BatchNorm"):
            gamma = (
                tf1.get_variable("gamma", [c], initializer=tf1.ones_initializer())
                if scale
                else None
            )
            beta = tf1.get_variable("beta", [c], initializer=tf1.zeros_initializer())
            mean = tf1.get_variable(
                "moving_mean", [c], initializer=tf1.zeros_initializer(), trainable=False
            )
            var = tf1.get_variable(
                "moving_variance", [c], initializer=tf1.ones_initializer(), trainable=False
            )
        out = tf1.nn.batch_normalization(inputs, mean, var, beta, gamma, epsilon)
        return activation_fn(out) if activation_fn is not None else out

    def conv2d(inputs, num_outputs, kernel_size, **kw):
        ov = _overrides(id(slim.conv2d))
        stride = _get(kw, ov, "stride", 1)
        rate = _get(kw, ov, "rate", 1)
        padding = _get(kw, ov, "padding", "SAME")
        activation_fn = _get(kw, ov, "activation_fn", tf1.nn.relu)
        normalizer_fn = _get(kw, ov, "normalizer_fn", None)
        scope = _get(kw, ov, "scope", None)
        for ignored in (
            "weights_regularizer",
            "weights_initializer",
            "biases_initializer",
            "data_format",
            "reuse",
        ):
            _get(kw, ov, ignored, None)
        assert not kw, f"unhandled conv2d kwargs: {kw}"
        kh, kw_ = kernel_size
        cin = int(inputs.shape[-1])
        with tf1.variable_scope(scope, default_name="Conv"):
            w = tf1.get_variable(
                "weights",
                [kh, kw_, cin, num_outputs],
                initializer=tf1.glorot_uniform_initializer(seed=0),
            )
            out = tf1.nn.conv2d(
                inputs,
                w,
                strides=[1, stride, stride, 1],
                padding=padding,
                dilations=[1, rate, rate, 1],
            )
            if normalizer_fn is not None:
                out = normalizer_fn(out)
            else:
                b = tf1.get_variable(
                    "biases", [num_outputs], initializer=tf1.zeros_initializer()
                )
                out = tf1.nn.bias_add(out, b)
        return activation_fn(out) if activation_fn is not None else out

    def conv2d_transpose(inputs, num_outputs, kernel_size, **kw):
        ov = _overrides(id(slim.conv2d_transpose))
        stride = _get(kw, ov, "stride", 1)
        padding = _get(kw, ov, "padding", "SAME")
        activation_fn = _get(kw, ov, "activation_fn", tf1.nn.relu)
        normalizer_fn = _get(kw, ov, "normalizer_fn", None)
        scope = _get(kw, ov, "scope", None)
        for ignored in (
            "weights_regularizer",
            "weights_initializer",
            "biases_initializer",
            "data_format",
        ):
            _get(kw, ov, ignored, None)
        assert not kw, f"unhandled conv2d_transpose kwargs: {kw}"
        kh, kw_ = kernel_size
        cin = int(inputs.shape[-1])
        shp = tf1.shape(inputs)
        out_shape = tf1.stack([shp[0], shp[1] * stride, shp[2] * stride, num_outputs])
        with tf1.variable_scope(scope, default_name="Conv2d_transpose"):
            # TF deconv kernel layout: [kh, kw, OUT, IN].
            w = tf1.get_variable(
                "weights",
                [kh, kw_, num_outputs, cin],
                initializer=tf1.glorot_uniform_initializer(seed=0),
            )
            out = tf1.nn.conv2d_transpose(
                inputs, w, out_shape, strides=[1, stride, stride, 1], padding=padding
            )
            if normalizer_fn is not None:
                out = normalizer_fn(out)
            else:
                b = tf1.get_variable(
                    "biases", [num_outputs], initializer=tf1.zeros_initializer()
                )
                out = tf1.nn.bias_add(out, b)
        return activation_fn(out) if activation_fn is not None else out

    def max_pool2d(inputs, kernel_size, **kw):
        ov = _overrides(id(slim.max_pool2d))
        stride = _get(kw, ov, "stride", 2)
        padding = _get(kw, ov, "padding", "SAME")
        scope = _get(kw, ov, "scope", None)
        _get(kw, ov, "data_format", "NHWC")
        assert not kw, f"unhandled max_pool2d kwargs: {kw}"
        with tf1.name_scope(scope, "MaxPool2D"):
            return tf1.nn.max_pool2d(
                inputs,
                ksize=[1, kernel_size[0], kernel_size[1], 1],
                strides=[1, stride, stride, 1],
                padding=padding,
            )

    def repeat(inputs, repetitions, layer, *args, **kwargs):
        scope = kwargs.pop("scope")
        out = inputs
        with tf1.variable_scope(scope):
            for i in range(repetitions):
                out = layer(out, *args, scope=f"{scope}_{i + 1}", **kwargs)
        return out

    def softmax(logits, scope=None):
        with tf1.name_scope(scope, "softmax"):
            return tf1.nn.softmax(logits)

    def dropout(inputs, keep_prob=0.5, is_training=True, scope=None):
        del keep_prob, scope
        assert not is_training, "inference-only shim"
        return inputs

    def l2_regularizer(scale):
        return lambda w: scale * tf1.nn.l2_loss(w)

    def fully_connected(*a, **k):
        raise NotImplementedError("fully_connected is not used by the RON graph")

    slim.arg_scope = arg_scope
    slim.batch_norm = batch_norm
    slim.conv2d = conv2d
    slim.conv2d_transpose = conv2d_transpose
    slim.max_pool2d = max_pool2d
    slim.repeat = repeat
    slim.softmax = softmax
    slim.dropout = dropout
    slim.l2_regularizer = l2_regularizer
    slim.fully_connected = fully_connected
    return slim
