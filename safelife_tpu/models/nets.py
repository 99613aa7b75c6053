"""Policy and Q networks, architecture parity with the reference
(``training/models.py:9-108``): a 3-conv VALID-padded CNN trunk
(5x5/s2 -> 32, 3x3/s2 -> 64, 3x3/s1 -> 64, ReLU) feeding either a
policy+value head (dense 512) or dueling Q heads (dense 256 each).

Inputs are NHWC float32 observations (binary channels). The reference
transposes (h, w, c) -> (c, w, h) before its NCHW convs; we transpose the
spatial axes to match its exact geometry on non-square views.

Packed observations: with ``unpack_channels`` set, the networks instead
take the env's raw packed int32 views ([..., vh, vw], the
``output_channels=None`` form) and unpack the binary channels at the
input boundary. Bit-exact with feeding pre-unpacked uint8 channels
(asserted in tests/test_training.py) — but the observation tensors that
training *stores* (PPO trajectory, DQN replay) shrink ~6x physically on
TPU: channel-minor uint8 [..., 25, 25, 15] pads its (25, 15) minor dims
to (32, 128) byte tiles, while int32 [..., 25, 25] pads to (32, 128)
words; the unpack itself fuses into the first conv's input relayout.
"""

import functools

import flax.linen as nn
import jax.lax
import jax.numpy as jnp
import numpy as np

#: Training-math precision names -> XLA dot/conv precision. TPU MXUs
#: multiply f32 operands in bfloat16 by DEFAULT; the reference trains in
#: strict float32 (torch CPU/CUDA), and PPO's clipped-ratio loss rides on
#: small advantage signals that bf16 rounding perturbs (the 16-lane
#: bf16-era learning-curve sweep underperformed the reference's torch
#: stack). "float32" (HIGHEST) is therefore the training default;
#: "tensorfloat32" (one extra bf16 pass) and "bfloat16" (raw MXU) are
#: opt-in speedups via the ``train.precision`` config key.
PRECISIONS = {
    "float32": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
    "tensorfloat32": jax.lax.Precision.HIGH,
    "high": jax.lax.Precision.HIGH,
    "bfloat16": jax.lax.Precision.DEFAULT,
    "default": jax.lax.Precision.DEFAULT,
}


#: torch's nn.Conv2d/nn.Linear default weight init — kaiming_uniform with
#: a=sqrt(5) — reduces to U(-1/sqrt(fan_in), +1/sqrt(fan_in)); biases draw
#: from the same bound (torch/nn/modules/{conv,linear}.py reset_parameters).
#: The reference never overrides it (training/models.py), so the init
#: distribution is part of its learning recipe. variance_scaling with
#: scale 1/3 gives exactly that uniform bound.
_TORCH_KERNEL_INIT = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(fan_in):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        import jax.random
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _init_kwargs(torch_init, fan_in):
    """Layer init kwargs: torch-matched or flax defaults."""
    if not torch_init:
        return {}
    return {"kernel_init": _TORCH_KERNEL_INIT,
            "bias_init": _torch_bias_init(fan_in)}


def unpack_obs(obs, channels):
    """Packed int32 views [..., vh, vw] -> float32 [..., vh, vw, C].

    The exact unpack the env applies under ``output_channels``
    (env/env.py:get_obs_batch; reference safelife_env.py:136-146).
    """
    shifts = jnp.array(channels, jnp.int32)
    return ((obs[..., None] >> shifts) & 1).astype(jnp.float32)


class SafeLifeCNN(nn.Module):
    """Shared convolutional trunk. Works best for 25x25 views."""

    precision: str = "float32"
    torch_init: bool = False

    @nn.compact
    def __call__(self, x):
        p = PRECISIONS[self.precision]
        ik = functools.partial(_init_kwargs, self.torch_init)
        x = jnp.swapaxes(x, -2, -3)  # (h, w, c) -> (w, h, c), parity quirk
        x = nn.relu(nn.Conv(32, (5, 5), strides=(2, 2), padding="VALID",
                            precision=p, **ik(25 * x.shape[-1]))(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID",
                            precision=p, **ik(9 * 32))(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1), padding="VALID",
                            precision=p, **ik(9 * 64))(x))
        return x.reshape(x.shape[:-3] + (-1,))


def cnn_output_features(input_shape):
    """Feature count after the trunk for an (h, w, c) input."""
    h, w, c = input_shape
    h = (h - 4 + 1) // 2
    h = (h - 2 + 1) // 2
    h = h - 2
    w = (w - 4 + 1) // 2
    w = (w - 2 + 1) // 2
    w = w - 2
    return 64 * h * w


class SafeLifePolicyNetwork(nn.Module):
    """Actor-critic network: obs -> (value, policy-probabilities).

    Parity: reference ``SafeLifePolicyNetwork`` (models.py:79-108). Returns
    softmax probabilities (not logits) because the reference's PPO loss is
    written in terms of probability ratios.
    """

    dense_depth: int = 1
    dense_width: int = 512
    num_actions: int = 9
    unpack_channels: tuple = None  # set -> obs is packed int32 [.., vh, vw]
    precision: str = "float32"
    torch_init: bool = False

    @nn.compact
    def __call__(self, obs):
        p = PRECISIONS[self.precision]
        ik = functools.partial(_init_kwargs, self.torch_init)
        if self.unpack_channels is not None:
            obs = unpack_obs(obs, self.unpack_channels)
        x = SafeLifeCNN(precision=self.precision,
                        torch_init=self.torch_init)(obs.astype(jnp.float32))
        for _ in range(self.dense_depth):
            x = nn.relu(nn.Dense(self.dense_width, precision=p,
                                 **ik(x.shape[-1]))(x))
        value = nn.Dense(1, precision=p, **ik(x.shape[-1]))(x)[..., 0]
        logits = nn.Dense(self.num_actions, precision=p,
                          **ik(x.shape[-1]))(x)
        policy = nn.softmax(logits, axis=-1)
        return value, policy


class SafeLifeQNetwork(nn.Module):
    """Dueling Q network. Parity: reference ``SafeLifeQNetwork``
    (models.py:46-76), including the mean-advantage normalization."""

    num_actions: int = 9
    unpack_channels: tuple = None  # set -> obs is packed int32 [.., vh, vw]
    precision: str = "float32"
    torch_init: bool = False

    @nn.compact
    def __call__(self, obs):
        p = PRECISIONS[self.precision]
        ik = functools.partial(_init_kwargs, self.torch_init)
        if self.unpack_channels is not None:
            obs = unpack_obs(obs, self.unpack_channels)
        x = SafeLifeCNN(precision=self.precision,
                        torch_init=self.torch_init)(obs.astype(jnp.float32))
        f = x.shape[-1]
        adv = nn.Dense(self.num_actions, precision=p, **ik(256))(
            nn.relu(nn.Dense(256, precision=p, **ik(f))(x)))
        val = nn.Dense(1, precision=p, **ik(256))(
            nn.relu(nn.Dense(256, precision=p, **ik(f))(x)))
        return val + adv - adv.mean(axis=-1, keepdims=True)


def init_policy_params(key, view_shape, num_channels):
    """Initialize policy network parameters for a given observation shape."""
    model = SafeLifePolicyNetwork()
    dummy = np.zeros((1,) + tuple(view_shape) + (num_channels,), np.float32)
    return model, model.init(key, dummy)
