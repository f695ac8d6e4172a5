"""Packages the best atom-detection checkpoint for deployment.

Parity: reference atom_detection/save_model.py:64-126 — restores the
best-by-accuracy checkpoint and exports an inference artifact. Natively a
flax-bytes params file (+ JSON architecture); optionally also a jax2tf TF
SavedModel (--export_tf) for TF-serving stacks. No GCS upload
(zero-egress divergence).

  python -m putting_dune_tpu.atom_detection.save_model \
      --workdir=/path/to/train_run --output_dir=/path/to/artifact
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--workdir', required=True)
  parser.add_argument('--output_dir', required=True)
  parser.add_argument('--image_size', type=int, default=256)
  parser.add_argument('--features', type=int, nargs='+',
                      default=[32, 64, 128, 256])
  parser.add_argument('--export_tf', action='store_true')
  args = parser.parse_args()

  import flax.serialization
  import jax
  import jax.numpy as jnp

  from putting_dune_tpu.atom_detection import model as model_lib
  from putting_dune_tpu.atom_detection import train as train_lib

  config = train_lib.Config(
      workdir=args.workdir,
      features=tuple(args.features),
      image_size=args.image_size,
  )
  params = train_lib.load_params(args.workdir, config)

  os.makedirs(args.output_dir, exist_ok=True)
  with open(os.path.join(args.output_dir, 'params.msgpack'), 'wb') as f:
    f.write(flax.serialization.to_bytes(params))
  with open(os.path.join(args.output_dir, 'model.json'), 'w') as f:
    json.dump(
        {
            'kind': 'atom_detection_unet',
            'features': list(args.features),
            'image_size': args.image_size,
            'num_classes': 3,
        },
        f,
    )
  print(f'Saved native artifact to {args.output_dir}')

  if args.export_tf:
    from putting_dune_tpu.io import tf_export

    module = model_lib.UNet(features=tuple(args.features))

    def fn(image):
      return module.apply({'params': params}, image)

    tf_export.export_tf_saved_model(
        jax.jit(fn),
        (1, args.image_size, args.image_size, 1),
        os.path.join(args.output_dir, 'tf_saved_model'),
        input_name='image',
    )
    print('Exported TF SavedModel.')


if __name__ == '__main__':
  main()
