"""Core pytree state structures for the batched simulator.

TPU-first replacement for the reference's proto-backed mutable dataclasses
(/root/reference/putting_dune/microscope_utils.py:72-874). Every structure is
a frozen flax.struct pytree of fixed-shape arrays with a leading batch dim,
so the whole simulator state lives on device and moves through jitted pure
functions. Ragged data (atoms inside the field of view) is represented as
fixed-capacity arrays plus validity masks.

Frame conventions match the reference exactly: "material" = angstroms,
"microscope" = [0, 1]^2 within the FOV.
"""

from __future__ import annotations

from flax import struct
import jax.numpy as jnp

from putting_dune_tpu import geometry


class FieldOfView(struct.PyTreeNode):
  """Batched microscope field of view (reference microscope_utils.py:235-500).

  Attributes:
    lower_left: (..., 2) material-frame angstroms.
    upper_right: (..., 2) material-frame angstroms.
  """

  lower_left: jnp.ndarray
  upper_right: jnp.ndarray

  @property
  def width(self) -> jnp.ndarray:
    return self.upper_right[..., 0] - self.lower_left[..., 0]

  @property
  def height(self) -> jnp.ndarray:
    return self.upper_right[..., 1] - self.lower_left[..., 1]

  @property
  def offset(self) -> jnp.ndarray:
    """Center of the FOV, (..., 2)."""
    return (self.lower_left + self.upper_right) / 2.0

  def shift(self, delta: jnp.ndarray) -> 'FieldOfView':
    return FieldOfView(self.lower_left + delta, self.upper_right + delta)

  def resize(self, new_width, new_height) -> 'FieldOfView':
    """Resizes around the current center (microscope_utils.py:292-318)."""
    half = jnp.stack(
        [jnp.broadcast_to(new_width, self.width.shape),
         jnp.broadcast_to(new_height, self.height.shape)], axis=-1) / 2.0
    center = self.offset
    return FieldOfView(center - half, center + half)

  def zoom(self, zoom_factor) -> 'FieldOfView':
    return self.resize(self.width / zoom_factor, self.height / zoom_factor)

  def microscope_to_material(self, point: jnp.ndarray) -> jnp.ndarray:
    return geometry.microscope_to_material(
        point, self.lower_left, self.upper_right)

  def material_to_microscope(self, point: jnp.ndarray) -> jnp.ndarray:
    return geometry.material_to_microscope(
        point, self.lower_left, self.upper_right)


class BeamControl(struct.PyTreeNode):
  """A beam position + dwell command (reference microscope_utils.py:180-232).

  position is interpreted in whichever frame the consumer documents
  (adapters emit microscope frame; the KMC core takes material frame).

  Attributes:
    position: (..., 2).
    dwell_seconds: (...,) seconds, float32 (the reference uses timedelta;
      on device we keep raw seconds).
    voltage_kv: (...,) or None.
    current_na: (...,) or None.
  """

  position: jnp.ndarray
  dwell_seconds: jnp.ndarray
  voltage_kv: jnp.ndarray | None = None
  current_na: jnp.ndarray | None = None


class MaterialState(struct.PyTreeNode):
  """Pristine single-doped graphene state, O(1) per environment.

  World positions are implicit: (canonical + offset) @ R(theta). The dopant
  is tracked by lattice site index rather than by scanning atomic numbers
  (cf. reference graphene.py:696-746).

  Attributes:
    offset: (B, 2) random per-episode lattice offset, angstroms.
    theta: (B,) random per-episode lattice rotation, radians.
    si_index: (B,) int32 lattice site currently holding the silicon.
  """

  offset: jnp.ndarray
  theta: jnp.ndarray
  si_index: jnp.ndarray


class AtomWindow(struct.PyTreeNode):
  """Fixed-capacity view of the atoms inside a FOV (masked, batched).

  Replaces the reference's ragged AtomicGridMicroscopeFrame crop
  (graphene.py:600-644) with (B, K) slots + validity mask.

  Attributes:
    positions: (B, K, 2) microscope-frame coordinates in [0, 1].
    atomic_numbers: (B, K) int32 (6 = C, 14 = Si); padding slots are 0.
    mask: (B, K) bool, True for real atoms.
    si_slot: (B,) int32 slot index of the silicon, -1 if not in view.
  """

  positions: jnp.ndarray
  atomic_numbers: jnp.ndarray
  mask: jnp.ndarray
  si_slot: jnp.ndarray


class ImagingParams(struct.PyTreeNode):
  """Per-episode STEM image domain-randomization parameters.

  Parity: reference imaging.py:28-72 (ImageGenerationParameters and the two
  samplers). All fields are (B,) float32.
  """

  intensity_exponent: jnp.ndarray
  gaussian_variance: jnp.ndarray
  jitter_rate: jnp.ndarray
  poisson_rate_multiplier: jnp.ndarray
  salt_and_pepper_amount: jnp.ndarray
  blur_amount: jnp.ndarray
  contrast_gamma: jnp.ndarray
  exponential_lambda: jnp.ndarray
  uniform_noise_scale: jnp.ndarray


class MicroscopeObservation(struct.PyTreeNode):
  """What the (simulated) microscope reports after a step.

  Parity: reference microscope_utils.py:538-604. `window` and `image` are
  optional (None unless requested) so the fast no-image path carries no
  O(N) or O(pixels) data.

  Attributes:
    fov: current field of view.
    si_position_microscope: (B, 2) silicon position in [0,1]^2.
    neighbor_positions_microscope: (B, 3, 2) its 3 neighbors, microscope frame.
    elapsed_seconds: (B,) simulated seconds consumed by the step.
    silicon_in_view: (B,) bool — False models SiliconNotFoundError.
    last_controls: the controls applied this step (microscope frame).
    window: optional AtomWindow crop of the FOV.
    image: optional (B, H, W) rendered STEM image.
  """

  fov: FieldOfView
  si_position_microscope: jnp.ndarray
  neighbor_positions_microscope: jnp.ndarray
  elapsed_seconds: jnp.ndarray
  silicon_in_view: jnp.ndarray
  last_controls: BeamControl | None = None
  window: AtomWindow | None = None
  image: jnp.ndarray | None = None


class SimulatorState(struct.PyTreeNode):
  """Full simulator state between steps.

  Attributes:
    material: lattice pose + dopant site.
    fov: current field of view (square, tracks the silicon).
    imaging: per-episode image randomization parameters.
    drift: (B, 2) cumulative instrument drift in material-frame angstroms —
      the TRUE offset between where the instrument believes its FOV is and
      where the sample actually sits (reference microscope_utils.py:760-835
      models the same quantity as per-frame Drift labels). Observations are
      built from the drifted world; physics (KMC, goals) stays in the true
      frame. None is treated as zero drift (states from older checkpoints).
  """

  material: MaterialState
  fov: FieldOfView
  imaging: ImagingParams
  drift: jnp.ndarray | None = None
