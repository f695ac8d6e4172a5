"""TF-free tensorflow.TensorProto codec: wire parity with real TensorFlow.

The reference writes observation/transition images as
tensorflow.TensorProto (microscope_utils.py:572-593 via
tf.make_tensor_proto / tf.make_ndarray). These tests check the TF-free
codec head-to-head against the REAL TensorFlow implementation where it is
installed (golden bytes in both directions), plus the NDArray/TensorProto
sniffing on the observation image fields.
"""

import datetime as dt

import numpy as np
import pytest

from putting_dune_tpu import microscope_data as md
from putting_dune_tpu.io import tensorproto as tp
from putting_dune_tpu.proto import putting_dune_tpu_pb2 as pb

DTYPES = [
    np.float32, np.float64, np.int32, np.uint8, np.int16, np.int8,
    np.int64, np.bool_, np.uint16, np.float16, np.uint32, np.uint64,
]


def _arr(dtype, shape=(3, 4), seed=0):
  rng = np.random.default_rng(seed)
  if np.issubdtype(dtype, np.floating):
    return rng.standard_normal(shape).astype(dtype)
  if dtype is np.bool_:
    return rng.uniform(size=shape) > 0.5
  info = np.iinfo(dtype)
  return rng.integers(info.min, min(info.max, 1 << 30), size=shape,
                      endpoint=True).astype(dtype)


@pytest.mark.parametrize('dtype', DTYPES)
def test_tensorproto_roundtrip_all_dtypes(dtype):
  a = _arr(dtype)
  out = tp.tensor_proto_to_ndarray(tp.ndarray_to_tensor_proto(a))
  assert out.dtype == np.dtype(dtype).newbyteorder('=')
  np.testing.assert_array_equal(out, a)


def test_typed_value_fields_and_broadcast():
  # tf.make_ndarray semantics: typed value fields fill the tensor, with
  # the LAST value broadcast over any remainder.
  msg = pb.TensorProtoCompat(dtype=1, float_val=[1.0, 2.0])
  msg.tensor_shape.dim.add(size=2)
  msg.tensor_shape.dim.add(size=3)
  out = tp.tensor_proto_to_ndarray(msg)
  np.testing.assert_array_equal(
      out, np.asarray([[1, 2, 2], [2, 2, 2]], np.float32)
  )


def test_scalar_tensorproto():
  msg = pb.TensorProtoCompat(dtype=2, double_val=[3.5])
  out = tp.tensor_proto_to_ndarray(msg)
  assert out.shape == () and out == 3.5


@pytest.mark.parametrize('dtype', DTYPES)
def test_golden_decode_of_real_tf_bytes(dtype):
  """Bytes produced by the REAL tf.make_tensor_proto must decode."""
  tf = pytest.importorskip('tensorflow')
  a = _arr(dtype, shape=(5, 7), seed=3)
  raw = tf.make_tensor_proto(a).SerializeToString()
  ours = pb.TensorProtoCompat()
  ours.ParseFromString(raw)
  np.testing.assert_array_equal(tp.tensor_proto_to_ndarray(ours), a)


@pytest.mark.parametrize('dtype', DTYPES)
def test_golden_encode_readable_by_real_tf(dtype):
  """Bytes we emit must decode through the REAL tf.make_ndarray."""
  tf = pytest.importorskip('tensorflow')
  from tensorflow.core.framework import tensor_pb2

  a = _arr(dtype, shape=(4, 2), seed=5)
  raw = tp.ndarray_to_tensor_proto(a).SerializeToString()
  theirs = tensor_pb2.TensorProto()
  theirs.ParseFromString(raw)
  np.testing.assert_array_equal(tf.make_ndarray(theirs), a)


def test_golden_decode_of_tf_scalar_and_list_forms():
  """tf.make_tensor_proto from python scalars/lists uses typed fields."""
  tf = pytest.importorskip('tensorflow')
  for value, expect in [
      (3.25, np.float32(3.25)),
      ([1, 2, 3], np.asarray([1, 2, 3], np.int32)),
      ([[True, False]], np.asarray([[True, False]])),
  ]:
    raw = tf.make_tensor_proto(value).SerializeToString()
    ours = pb.TensorProtoCompat()
    ours.ParseFromString(raw)
    np.testing.assert_array_equal(tp.tensor_proto_to_ndarray(ours),
                                  np.asarray(expect))


def test_sniffing_is_disjoint():
  a = _arr(np.float32, shape=(8, 8), seed=9)
  nd_bytes = tp.encode_image_bytes(a, tp.NDARRAY_FORMAT)
  tp_bytes = tp.encode_image_bytes(a, tp.TENSORPROTO_FORMAT)
  assert nd_bytes != tp_bytes
  np.testing.assert_array_equal(tp.decode_image_bytes(nd_bytes), a)
  np.testing.assert_array_equal(tp.decode_image_bytes(tp_bytes), a)
  with pytest.raises(ValueError):
    tp.decode_image_bytes(b'\x0a\x03abc')  # valid wire, neither format


def _observation(image):
  rng = np.random.default_rng(0)
  nums = np.full(4, 6)
  nums[1] = 14
  grid = md.AtomicGrid(rng.uniform(0, 1, (4, 2)), nums)
  fov = md.MicroscopeFieldOfView(
      lower_left=np.asarray([-5.0, -3.0]), upper_right=np.asarray([5.0, 7.0])
  )
  return md.MicroscopeObservation(
      grid=grid,
      fov=fov,
      controls=(md.BeamControl(np.asarray([0.5, 0.5]), dt.timedelta(seconds=1.5)),),
      elapsed_time=dt.timedelta(seconds=2.0),
      image=image,
  )


def test_observation_roundtrip_both_wire_formats():
  image = _arr(np.float64, shape=(16, 16), seed=11)
  obs = _observation(image)
  default_bytes = obs.to_proto_bytes()
  with md.image_wire_format('tensorproto'):
    ref_bytes = obs.to_proto_bytes()
  assert default_bytes != ref_bytes
  for raw in (default_bytes, ref_bytes):
    back = md.MicroscopeObservation.from_proto_bytes(raw)
    np.testing.assert_array_equal(back.image, image)
    assert back.label_image is None
    assert back.grid == obs.grid


def test_tensorproto_mode_records_read_back_by_real_tf():
  """Full observation written in tensorproto mode: the image field must
  contain bytes the real TF stack decodes (what a reference consumer
  does with our records)."""
  tf = pytest.importorskip('tensorflow')
  from tensorflow.core.framework import tensor_pb2

  image = _arr(np.float32, shape=(12, 12), seed=13)
  with md.image_wire_format('tensorproto'):
    raw = _observation(image).to_proto_bytes()
  msg = pb.MicroscopeObservation()
  msg.ParseFromString(raw)
  theirs = tensor_pb2.TensorProto()
  theirs.ParseFromString(msg.image)
  np.testing.assert_array_equal(tf.make_ndarray(theirs), image)


def test_transition_roundtrip_tensorproto_mode():
  image = _arr(np.float32, shape=(6, 6), seed=17)
  t = md.Transition(
      grid_before=_observation(None).grid,
      grid_after=_observation(None).grid,
      fov_before=_observation(None).fov,
      fov_after=_observation(None).fov,
      controls=(md.BeamControl(np.asarray([0.1, 0.9]), dt.timedelta(seconds=2.0)),),
      image_before=image,
      label_image_after=(image > 0).astype(np.uint8),
  )
  with md.image_wire_format('tensorproto'):
    raw = t.to_proto_bytes()
  back = md.Transition.from_proto_bytes(raw)
  np.testing.assert_array_equal(back.image_before, image)
  np.testing.assert_array_equal(
      back.label_image_after, (image > 0).astype(np.uint8)
  )
  assert back.image_after is None and back.label_image_before is None
