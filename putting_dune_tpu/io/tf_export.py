"""Optional TF SavedModel export for deployment parity.

The reference deploys every learned model as a jax2tf-converted TF
SavedModel (learn_rates.py:884-923, atom_detection/save_model.py:85-101).
This framework's native path is orbax/flax checkpoints consumed directly
by JAX, but interoperability with TF-serving microscope stacks is kept via
this helper. TensorFlow is imported lazily: the framework works without it.
"""

from __future__ import annotations

from typing import Callable, Sequence


def export_tf_saved_model(
    fn: Callable,
    input_shape: Sequence[int],
    save_dir: str,
    *,
    input_name: str = 'input',
    with_gradient: bool = False,
) -> None:
  """Exports a jittable fn (single array input) as a TF SavedModel.

  Parity: the reference's package_model pattern (learn_rates.py:884-923).
  """
  import numpy as np
  import tensorflow as tf
  from jax.experimental import jax2tf

  converted = jax2tf.convert(fn, with_gradient=with_gradient)
  module = tf.Module()
  module.__call__ = tf.function(
      converted,
      autograph=False,
      input_signature=[
          tf.TensorSpec(shape=list(input_shape), dtype=np.float32,
                        name=input_name)
      ],
  )
  tf.saved_model.save(module, save_dir)


def load_tf_saved_model(save_dir: str):
  """Loads a SavedModel exported by export_tf_saved_model (or TF tools)."""
  import tensorflow as tf

  return tf.saved_model.load(save_dir)
