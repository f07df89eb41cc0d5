"""Input subsampling blocks (parity: conformer/subsampling.py,
squeezeformer/subsampling.py:19-77, efficient_conformer/subsampling.py:8-59,
deepspeech2/conv.py:5-23).

All operate channels-last: x (B, T, F) → (B, T', odim). Each class reports
`subsampling_rate` and `right_context` (frames of lookahead consumed),
used by the streaming window math (predict.py:282-300 in the reference).
"""

import jax.numpy as jnp
import flax.linen as nn

from masr_tpu.models.embedding import POS_ENC_CLASSES


def _conv_out_len(t, kernel, stride):
    return (t - kernel) // stride + 1


class LinearNoSubsampling(nn.Module):
    idim: int
    odim: int
    dropout_rate: float = 0.1
    pos_enc_type: str = "abs_pos"
    pos_dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    subsampling_rate: int = 1
    right_context: int = 0

    def pos_enc(self):
        return POS_ENC_CLASSES[self.pos_enc_type](
            self.odim, self.pos_dropout_rate, name="pos_enc")

    @nn.compact
    def __call__(self, x, x_mask=None, offset=0, train: bool = False):
        x = nn.Dense(self.odim, dtype=self.dtype, name="linear")(x)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="ln")(x)
        x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.relu(x)
        x, pos_emb = self.pos_enc()(x, offset, train)
        return x, pos_emb, x_mask


class Conv2dSubsampling4(nn.Module):
    """Two (3x3, stride 2) convs + linear: rate 4, right context 6."""
    idim: int
    odim: int
    dropout_rate: float = 0.1
    pos_enc_type: str = "rel_pos"
    pos_dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    subsampling_rate: int = 4
    right_context: int = 6

    def pos_enc(self):
        return POS_ENC_CLASSES[self.pos_enc_type](
            self.odim, self.pos_dropout_rate, name="pos_enc")

    @nn.compact
    def __call__(self, x, x_mask=None, offset=0, train: bool = False):
        B = x.shape[0]
        x = x[..., None]  # (B, T, F, 1)
        x = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="conv1")(x))
        x = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="conv2")(x))
        B_, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        x = nn.Dense(self.odim, dtype=self.dtype, name="out")(x)
        x, pos_emb = self.pos_enc()(x, offset, train)
        if x_mask is not None:
            x_mask = x_mask[:, :, :-2:2][:, :, :-2:2]
        return x, pos_emb, x_mask


class Conv2dSubsampling6(nn.Module):
    """(3,2) then (5,3): rate 6, right context 10."""
    idim: int
    odim: int
    dropout_rate: float = 0.1
    pos_enc_type: str = "rel_pos"
    pos_dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    subsampling_rate: int = 6
    right_context: int = 10

    def pos_enc(self):
        return POS_ENC_CLASSES[self.pos_enc_type](
            self.odim, self.pos_dropout_rate, name="pos_enc")

    @nn.compact
    def __call__(self, x, x_mask=None, offset=0, train: bool = False):
        B = x.shape[0]
        x = x[..., None]
        x = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="conv1")(x))
        x = nn.relu(nn.Conv(self.odim, (5, 5), strides=(3, 3), padding="VALID",
                            dtype=self.dtype, name="conv2")(x))
        B_, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        x = nn.Dense(self.odim, dtype=self.dtype, name="linear")(x)
        x, pos_emb = self.pos_enc()(x, offset, train)
        if x_mask is not None:
            x_mask = x_mask[:, :, :-2:2][:, :, :-4:3]
        return x, pos_emb, x_mask


class Conv2dSubsampling8(nn.Module):
    """Three (3x3, stride 2) convs: rate 8, right context 14."""
    idim: int
    odim: int
    dropout_rate: float = 0.1
    pos_enc_type: str = "rel_pos"
    pos_dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    subsampling_rate: int = 8
    right_context: int = 14

    def pos_enc(self):
        return POS_ENC_CLASSES[self.pos_enc_type](
            self.odim, self.pos_dropout_rate, name="pos_enc")

    @nn.compact
    def __call__(self, x, x_mask=None, offset=0, train: bool = False):
        B = x.shape[0]
        x = x[..., None]
        for i in range(3):
            x = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2),
                                padding="VALID", dtype=self.dtype,
                                name=f"conv{i + 1}")(x))
        B_, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        x = nn.Dense(self.odim, dtype=self.dtype, name="linear")(x)
        x, pos_emb = self.pos_enc()(x, offset, train)
        if x_mask is not None:
            x_mask = x_mask[:, :, :-2:2][:, :, :-2:2][:, :, :-2:2]
        return x, pos_emb, x_mask


class DepthwiseConv2dSubsampling4(nn.Module):
    """Squeezeformer subsampling: pointwise conv then depthwise conv (both
    stride 2), pos-enc, then input projection
    (parity: squeezeformer/subsampling.py:19-77)."""
    idim: int
    odim: int
    dropout_rate: float = 0.1
    pos_enc_type: str = "rel_pos"
    pos_dropout_rate: float = 0.1
    dw_stride: bool = True
    input_dropout: bool = True
    dtype: jnp.dtype = jnp.float32
    subsampling_rate: int = 4
    right_context: int = 6

    def pos_enc(self):
        return POS_ENC_CLASSES[self.pos_enc_type](
            self.odim, self.pos_dropout_rate, name="pos_enc")

    @nn.compact
    def __call__(self, x, x_mask=None, offset=0, train: bool = False):
        B = x.shape[0]
        x = x[..., None]
        x = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="pw_conv")(x))
        x = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            feature_group_count=self.odim if self.dw_stride else 1,
                            dtype=self.dtype, name="dw_conv")(x))
        B_, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        x, pos_emb = self.pos_enc()(x, offset, train)
        if self.input_dropout:
            x = nn.Dense(self.odim, dtype=self.dtype, name="input_proj")(x)
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        if x_mask is not None:
            x_mask = x_mask[:, :, :-2:2][:, :, :-2:2]
        return x, pos_emb, x_mask


class Conv2dSubsampling2(nn.Module):
    """Efficient-Conformer entry: single (3x3, stride 2) conv: rate 2
    (parity: efficient_conformer/subsampling.py:8-59)."""
    idim: int
    odim: int
    dropout_rate: float = 0.1
    pos_enc_type: str = "rel_pos"
    pos_dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    subsampling_rate: int = 2
    right_context: int = 2

    def pos_enc(self):
        return POS_ENC_CLASSES[self.pos_enc_type](
            self.odim, self.pos_dropout_rate, name="pos_enc")

    @nn.compact
    def __call__(self, x, x_mask=None, offset=0, train: bool = False):
        B = x.shape[0]
        x = x[..., None]
        x = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="conv1")(x))
        B_, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        x = nn.Dense(self.odim, dtype=self.dtype, name="out")(x)
        x, pos_emb = self.pos_enc()(x, offset, train)
        if x_mask is not None:
            x_mask = x_mask[:, :, :-2:2]
        return x, pos_emb, x_mask


class Conv2dSubsampling4Pure(nn.Module):
    """DeepSpeech2 conv entry: two (3x3 stride 2) convs with SAME-height
    padding and no pos-enc (parity: deepspeech2/conv.py:5-23; output is the
    flattened conv features)."""
    idim: int
    odim: int = 32
    dtype: jnp.dtype = jnp.float32
    subsampling_rate: int = 4
    right_context: int = 6

    @property
    def output_dim(self):
        f = _conv_out_len(_conv_out_len(self.idim, 3, 2), 3, 2)
        return f * self.odim

    @nn.compact
    def __call__(self, x, x_len=None, train: bool = False):
        x = x[..., None]
        x = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="conv1")(x))
        x = nn.relu(nn.Conv(self.odim, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name="conv2")(x))
        B, T, F, C = x.shape
        x = x.reshape(B, T, F * C)
        if x_len is not None:
            x_len = (x_len - 3) // 2 + 1
            x_len = (x_len - 3) // 2 + 1
        return x, x_len


SUBSAMPLING_CLASSES = {
    "linear": LinearNoSubsampling,
    "conv2d": Conv2dSubsampling4,
    "conv2d6": Conv2dSubsampling6,
    "conv2d8": Conv2dSubsampling8,
}
