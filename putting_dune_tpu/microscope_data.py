"""Host-side microscope data structures (numpy) with proto round-trips.

Semantic parity with the reference proto-backed dataclasses
(/root/reference/putting_dune/microscope_utils.py:72-874) for everything
the offline pipelines and the real-microscope loop need: atomic grids,
beam controls, fields of view with frame conversions, observations,
transitions, trajectories and drift labels.

Design notes vs the reference:
  * numpy-only (no shapely Points, no TensorFlow). Images round-trip
    through the NDArray proto message by default, but reads auto-detect
    tensorflow.TensorProto payloads (what the reference writes) via the
    TF-free codec in io/tensorproto.py, and `image_wire_format
    ('tensorproto')` writes reference-consumable records.
  * frames are by-convention ("microscope" = [0,1]^2, "material" =
    angstroms), as in the reference's NewType tags.
  * The device-side batched structures live in structures.py; this module
    is the IO/real-hardware boundary.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
import datetime as dt
from typing import Optional, Sequence, Tuple

import numpy as np

from putting_dune_tpu import constants
from putting_dune_tpu.io import tensorproto as tensorproto_lib
from putting_dune_tpu.proto import putting_dune_tpu_pb2 as pb


# --- ndarray <-> proto -------------------------------------------------------


def ndarray_to_proto(array: Optional[np.ndarray]) -> Optional[pb.NDArray]:
  if array is None:
    return None
  array = np.ascontiguousarray(array)
  return pb.NDArray(
      dtype=array.dtype.str, shape=list(array.shape), data=array.tobytes()
  )


def proto_to_ndarray(msg: Optional[pb.NDArray]) -> Optional[np.ndarray]:
  if msg is None or not msg.dtype:
    return None
  return np.frombuffer(msg.data, dtype=np.dtype(msg.dtype)).reshape(
      tuple(msg.shape)
  )


# --- image wire format -------------------------------------------------------

# Observation/transition image fields carry raw submessage bytes on the
# wire (proto/putting_dune_tpu.proto): reads auto-detect NDArray vs
# tensorflow.TensorProto (reference-written records,
# /root/reference/putting_dune/microscope_utils.py:572-593); writes emit
# NDArray by default, or TensorProto inside `with
# image_wire_format('tensorproto')` for reference-consumable output.
_image_wire_format: contextvars.ContextVar[str] = contextvars.ContextVar(
    'image_wire_format', default=tensorproto_lib.NDARRAY_FORMAT
)


@contextlib.contextmanager
def image_wire_format(fmt: str):
  """Selects the on-wire encoding of image fields for writes in scope."""
  if fmt not in (
      tensorproto_lib.NDARRAY_FORMAT,
      tensorproto_lib.TENSORPROTO_FORMAT,
  ):
    raise ValueError(f'Unknown image wire format {fmt!r}')
  token = _image_wire_format.set(fmt)
  try:
    yield
  finally:
    _image_wire_format.reset(token)


def _encode_image(array: np.ndarray) -> bytes:
  return tensorproto_lib.encode_image_bytes(array, _image_wire_format.get())


_decode_image = tensorproto_lib.decode_image_bytes


def _point_to_proto(p: np.ndarray) -> pb.Point2D:
  return pb.Point2D(x=float(p[0]), y=float(p[1]))


def _proto_to_point(msg: pb.Point2D) -> np.ndarray:
  return np.asarray([msg.x, msg.y], dtype=np.float64)


class ProtoModel:
  """Mixin: serialize/deserialize through the proto schema."""

  def to_proto(self):
    raise NotImplementedError

  @classmethod
  def from_proto(cls, msg):
    raise NotImplementedError

  def to_proto_bytes(self) -> bytes:
    return self.to_proto().SerializeToString()

  @classmethod
  def from_proto_bytes(cls, data: bytes):
    msg = cls.ProtoMessage()
    msg.ParseFromString(data)
    return cls.from_proto(msg)


# --- core structures ----------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AtomicGrid(ProtoModel):
  """Atom positions (N, 2) + atomic numbers (N,).

  Parity: reference microscope_utils.py:122-173; equality is
  nearest-neighbor matching of positions + numbers.
  """

  ProtoMessage = pb.AtomicGrid

  atom_positions: np.ndarray
  atomic_numbers: np.ndarray

  def __post_init__(self):
    object.__setattr__(
        self, 'atom_positions', np.asarray(self.atom_positions, np.float64)
    )
    object.__setattr__(
        self, 'atomic_numbers', np.asarray(self.atomic_numbers, np.int32)
    )

  @property
  def num_atoms(self) -> int:
    return self.atom_positions.shape[0]

  def __eq__(self, other) -> bool:
    if not isinstance(other, AtomicGrid):
      return NotImplemented
    if self.num_atoms != other.num_atoms:
      return False
    if self.num_atoms == 0:
      return True
    # Match each of our atoms to other's nearest atom; require tight
    # positional agreement and equal species (reference :122-160).
    # A KD-tree keeps this O(N log N) — the pipelines ingest real scans
    # far larger than the 2.8k-atom simulator grids.
    from scipy import spatial

    d, nearest = spatial.cKDTree(other.atom_positions).query(
        self.atom_positions, k=1
    )
    if len(np.unique(nearest)) != self.num_atoms:
      return False
    return bool(
        (d < 1e-6).all()
        and (self.atomic_numbers == other.atomic_numbers[nearest]).all()
    )

  def __hash__(self):
    return hash((self.num_atoms, self.atomic_numbers.sum()))

  def to_proto(self) -> pb.AtomicGrid:
    msg = pb.AtomicGrid()
    for pos, num in zip(self.atom_positions, self.atomic_numbers):
      msg.atoms.add(
          atomic_number=int(num), position=_point_to_proto(pos)
      )
    return msg

  @classmethod
  def from_proto(cls, msg: pb.AtomicGrid) -> 'AtomicGrid':
    n = len(msg.atoms)
    positions = np.zeros((n, 2))
    numbers = np.zeros((n,), np.int32)
    for i, atom in enumerate(msg.atoms):
      positions[i] = (atom.position.x, atom.position.y)
      numbers[i] = atom.atomic_number
    return cls(positions, numbers)


@dataclasses.dataclass(frozen=True)
class BeamControl(ProtoModel):
  """Beam position + dwell (+ optional voltage/current).

  Parity: reference microscope_utils.py:180-232.
  """

  ProtoMessage = pb.BeamControl

  position: np.ndarray  # (2,)
  dwell_time: dt.timedelta
  voltage_kv: Optional[float] = None
  current_na: Optional[float] = None

  def __post_init__(self):
    object.__setattr__(
        self, 'position', np.asarray(self.position, np.float64).reshape(2)
    )

  def to_proto(self) -> pb.BeamControl:
    msg = pb.BeamControl(
        position=_point_to_proto(self.position),
        dwell_time_seconds=self.dwell_time.total_seconds(),
    )
    if self.voltage_kv is not None:
      msg.voltage_kv = self.voltage_kv
    if self.current_na is not None:
      msg.current_na = self.current_na
    return msg

  @classmethod
  def from_proto(cls, msg: pb.BeamControl) -> 'BeamControl':
    return cls(
        position=_proto_to_point(msg.position),
        dwell_time=dt.timedelta(seconds=msg.dwell_time_seconds),
        voltage_kv=msg.voltage_kv if msg.HasField('voltage_kv') else None,
        current_na=msg.current_na if msg.HasField('current_na') else None,
    )


@dataclasses.dataclass(frozen=True)
class MicroscopeFieldOfView(ProtoModel):
  """FOV corners in angstroms with frame-conversion helpers.

  Parity: reference microscope_utils.py:235-500.
  """

  ProtoMessage = pb.FieldOfView

  lower_left: np.ndarray  # (2,) angstroms
  upper_right: np.ndarray  # (2,) angstroms

  def __post_init__(self):
    object.__setattr__(
        self, 'lower_left', np.asarray(self.lower_left, np.float64).reshape(2)
    )
    object.__setattr__(
        self, 'upper_right',
        np.asarray(self.upper_right, np.float64).reshape(2),
    )

  @property
  def width(self) -> float:
    return float(self.upper_right[0] - self.lower_left[0])

  @property
  def height(self) -> float:
    return float(self.upper_right[1] - self.lower_left[1])

  @property
  def offset(self) -> np.ndarray:
    return (self.lower_left + self.upper_right) / 2.0

  def shift(self, delta: np.ndarray) -> 'MicroscopeFieldOfView':
    delta = np.asarray(delta).reshape(2)
    return MicroscopeFieldOfView(
        self.lower_left + delta, self.upper_right + delta
    )

  def resize(self, new_width: float, new_height: float
             ) -> 'MicroscopeFieldOfView':
    assert new_width > 0 and new_height > 0
    half = np.asarray([new_width, new_height]) / 2.0
    center = self.offset
    return MicroscopeFieldOfView(center - half, center + half)

  def zoom(self, zoom_factor: float) -> 'MicroscopeFieldOfView':
    assert zoom_factor > 0
    return self.resize(self.width / zoom_factor, self.height / zoom_factor)

  def microscope_frame_to_material_frame(self, point):
    """[0,1]^2 -> angstroms; accepts (..,2) arrays, AtomicGrid, BeamControl."""
    scale = self.upper_right - self.lower_left
    if isinstance(point, AtomicGrid):
      return AtomicGrid(
          point.atom_positions * scale + self.lower_left,
          point.atomic_numbers,
      )
    if isinstance(point, BeamControl):
      return BeamControl(
          point.position * scale + self.lower_left,
          point.dwell_time,
          point.voltage_kv,
          point.current_na,
      )
    arr = np.asarray(point, np.float64)
    return arr * scale + self.lower_left

  def material_frame_to_microscope_frame(self, point):
    """Angstroms -> [0,1]^2; accepts (..,2) arrays, AtomicGrid, BeamControl."""
    scale = self.upper_right - self.lower_left
    if isinstance(point, AtomicGrid):
      return AtomicGrid(
          (point.atom_positions - self.lower_left) / scale,
          point.atomic_numbers,
      )
    if isinstance(point, BeamControl):
      return BeamControl(
          (point.position - self.lower_left) / scale,
          point.dwell_time,
          point.voltage_kv,
          point.current_na,
      )
    arr = np.asarray(point, np.float64)
    return (arr - self.lower_left) / scale

  def get_atoms_in_bounds(
      self, grid: AtomicGrid, tolerance: float = 0.0
  ) -> AtomicGrid:
    """Material-frame crop with a tolerance buffer (reference :448-480)."""
    lo = self.lower_left - tolerance
    hi = self.upper_right + tolerance
    keep = np.all(
        (grid.atom_positions >= lo) & (grid.atom_positions <= hi), axis=1
    )
    return AtomicGrid(grid.atom_positions[keep], grid.atomic_numbers[keep])

  def __str__(self) -> str:
    ll, ur = self.lower_left, self.upper_right
    return (
        f'FOV [({ll[0]:.2f}, {ll[1]:.2f}), ({ur[0]:.2f}, {ur[1]:.2f})]'
    )

  def to_proto(self) -> pb.FieldOfView:
    return pb.FieldOfView(
        lower_left_angstroms=_point_to_proto(self.lower_left),
        upper_right_angstroms=_point_to_proto(self.upper_right),
    )

  @classmethod
  def from_proto(cls, msg: pb.FieldOfView) -> 'MicroscopeFieldOfView':
    return cls(
        _proto_to_point(msg.lower_left_angstroms),
        _proto_to_point(msg.upper_right_angstroms),
    )


@dataclasses.dataclass(frozen=True)
class MicroscopeObservation(ProtoModel):
  """One observation from the (real or simulated) microscope.

  Parity: reference microscope_utils.py:538-604. Grid positions are in the
  microscope frame.
  """

  ProtoMessage = pb.MicroscopeObservation

  grid: AtomicGrid
  fov: MicroscopeFieldOfView
  controls: Tuple[BeamControl, ...]
  elapsed_time: dt.timedelta
  image: Optional[np.ndarray] = None
  label_image: Optional[np.ndarray] = None

  def to_proto(self) -> pb.MicroscopeObservation:
    msg = pb.MicroscopeObservation(
        grid=self.grid.to_proto(),
        fov=self.fov.to_proto(),
        controls=[c.to_proto() for c in self.controls],
        elapsed_time_seconds=self.elapsed_time.total_seconds(),
    )
    if self.image is not None:
      msg.image = _encode_image(self.image)
    if self.label_image is not None:
      msg.label_image = _encode_image(self.label_image)
    return msg

  @classmethod
  def from_proto(cls, msg: pb.MicroscopeObservation
                 ) -> 'MicroscopeObservation':
    return cls(
        grid=AtomicGrid.from_proto(msg.grid),
        fov=MicroscopeFieldOfView.from_proto(msg.fov),
        controls=tuple(BeamControl.from_proto(c) for c in msg.controls),
        elapsed_time=dt.timedelta(seconds=msg.elapsed_time_seconds),
        image=_decode_image(msg.image) if msg.HasField('image') else None,
        label_image=(
            _decode_image(msg.label_image)
            if msg.HasField('label_image')
            else None
        ),
    )


@dataclasses.dataclass(frozen=True)
class Transition(ProtoModel):
  """A before/after pair of observations under applied controls.

  Parity: reference microscope_utils.py:607-723.
  """

  ProtoMessage = pb.Transition

  grid_before: AtomicGrid
  grid_after: AtomicGrid
  fov_before: MicroscopeFieldOfView
  fov_after: MicroscopeFieldOfView
  controls: Tuple[BeamControl, ...]
  image_before: Optional[np.ndarray] = None
  image_after: Optional[np.ndarray] = None
  label_image_before: Optional[np.ndarray] = None
  label_image_after: Optional[np.ndarray] = None

  def to_proto(self) -> pb.Transition:
    msg = pb.Transition(
        grid_before=self.grid_before.to_proto(),
        grid_after=self.grid_after.to_proto(),
        fov_before=self.fov_before.to_proto(),
        fov_after=self.fov_after.to_proto(),
        controls=[c.to_proto() for c in self.controls],
    )
    for name in (
        'image_before', 'image_after', 'label_image_before',
        'label_image_after',
    ):
      value = getattr(self, name)
      if value is not None:
        setattr(msg, name, _encode_image(value))
    return msg

  @classmethod
  def from_proto(cls, msg: pb.Transition) -> 'Transition':
    def image(name):
      return _decode_image(getattr(msg, name)) if msg.HasField(name) else None

    return cls(
        grid_before=AtomicGrid.from_proto(msg.grid_before),
        grid_after=AtomicGrid.from_proto(msg.grid_after),
        fov_before=MicroscopeFieldOfView.from_proto(msg.fov_before),
        fov_after=MicroscopeFieldOfView.from_proto(msg.fov_after),
        controls=tuple(BeamControl.from_proto(c) for c in msg.controls),
        image_before=image('image_before'),
        image_after=image('image_after'),
        label_image_before=image('label_image_before'),
        label_image_after=image('label_image_after'),
    )


@dataclasses.dataclass(frozen=True)
class Trajectory(ProtoModel):
  """A sequence of observations (reference microscope_utils.py:726-757)."""

  ProtoMessage = pb.Trajectory

  observations: Sequence[MicroscopeObservation]

  def to_proto(self) -> pb.Trajectory:
    return pb.Trajectory(
        observations=[o.to_proto() for o in self.observations]
    )

  @classmethod
  def from_proto(cls, msg: pb.Trajectory) -> 'Trajectory':
    return cls(
        observations=tuple(
            MicroscopeObservation.from_proto(o) for o in msg.observations
        )
    )


@dataclasses.dataclass(frozen=True)
class Drift(ProtoModel):
  """Global drift + per-atom jitter labels.

  Parity: reference microscope_utils.py:760-835, including
  apply_to_observation: shifts the FOV by `drift` and the atoms by their
  per-atom jitter (expressed in the microscope frame).
  """

  ProtoMessage = pb.Drift

  drift: np.ndarray  # (2,) angstroms
  jitter: np.ndarray  # (num_atoms, 2) angstroms

  def __post_init__(self):
    object.__setattr__(
        self, 'drift', np.asarray(self.drift, np.float64).reshape(2)
    )
    object.__setattr__(
        self, 'jitter', np.asarray(self.jitter, np.float64).reshape(-1, 2)
    )

  def apply_to_observation(
      self, observation: MicroscopeObservation
  ) -> MicroscopeObservation:
    """Applies drift to the FOV and jitter to each atom."""
    new_fov = observation.fov.shift(self.drift)
    scale = np.asarray([new_fov.width, new_fov.height])
    jitter_microscope = self.jitter / scale
    if jitter_microscope.shape[0] != observation.grid.num_atoms:
      raise ValueError(
          'Drift jitter must have one row per atom: '
          f'{jitter_microscope.shape[0]} != {observation.grid.num_atoms}'
      )
    new_grid = AtomicGrid(
        observation.grid.atom_positions + jitter_microscope,
        observation.grid.atomic_numbers,
    )
    return dataclasses.replace(observation, grid=new_grid, fov=new_fov)

  def to_proto(self) -> pb.Drift:
    return pb.Drift(
        drift=_point_to_proto(self.drift),
        jitter=[_point_to_proto(j) for j in self.jitter],
    )

  @classmethod
  def from_proto(cls, msg: pb.Drift) -> 'Drift':
    return cls(
        drift=_proto_to_point(msg.drift),
        jitter=np.asarray(
            [[p.x, p.y] for p in msg.jitter], np.float64
        ).reshape(-1, 2),
    )


@dataclasses.dataclass(frozen=True)
class LabeledAlignmentTrajectory(ProtoModel):
  """Trajectory + per-step drift labels (reference :838-874)."""

  ProtoMessage = pb.LabeledAlignmentTrajectory

  trajectory: Trajectory
  drifts: Sequence[Drift]

  def to_proto(self) -> pb.LabeledAlignmentTrajectory:
    return pb.LabeledAlignmentTrajectory(
        trajectory=self.trajectory.to_proto(),
        drifts=[d.to_proto() for d in self.drifts],
    )

  @classmethod
  def from_proto(
      cls, msg: pb.LabeledAlignmentTrajectory
  ) -> 'LabeledAlignmentTrajectory':
    return cls(
        trajectory=Trajectory.from_proto(msg.trajectory),
        drifts=tuple(Drift.from_proto(d) for d in msg.drifts),
    )


def get_silicon_positions(grid: AtomicGrid) -> np.ndarray:
  return grid.atom_positions[grid.atomic_numbers == constants.SILICON]


class SiliconNotFoundError(RuntimeError):
  """No silicon atom in the grid (reference graphene.py:81)."""


def get_single_silicon_position(grid: AtomicGrid) -> np.ndarray:
  """Position of THE silicon; nearest-center on multiples, raises on none.

  Parity: reference graphene.py:713-746.
  """
  positions = get_silicon_positions(grid)
  if positions.shape[0] == 0:
    raise SiliconNotFoundError()
  if positions.shape[0] > 1:
    d = np.linalg.norm(positions - np.asarray([[0.5, 0.5]]), axis=1)
    positions = positions[d.argmin():d.argmin() + 1]
  return positions.reshape(2)


def observation_from_device(
    window,
    fov,
    elapsed_seconds,
    batch_index: int = 0,
    controls: Tuple[BeamControl, ...] = (),
    image: Optional[np.ndarray] = None,
) -> MicroscopeObservation:
  """Converts one batch element of device observation parts to host form.

  Bridges the batched device simulator (structures.AtomWindow /
  structures.FieldOfView) to the host dataclasses used by pipelines and
  the real-microscope loop.
  """
  b = batch_index
  mask = np.asarray(window.mask)[b]
  grid = AtomicGrid(
      np.asarray(window.positions)[b][mask],
      np.asarray(window.atomic_numbers)[b][mask],
  )
  host_fov = MicroscopeFieldOfView(
      np.asarray(fov.lower_left)[b], np.asarray(fov.upper_right)[b]
  )
  return MicroscopeObservation(
      grid=grid,
      fov=host_fov,
      controls=controls,
      elapsed_time=dt.timedelta(
          seconds=float(np.asarray(elapsed_seconds)[b])
      ),
      image=None if image is None else np.asarray(image)[b],
  )
