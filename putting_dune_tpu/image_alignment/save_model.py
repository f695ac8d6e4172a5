"""Packages the best image-alignment checkpoint for deployment.

Parity: reference image_alignment/save_model.py (163 LoC jax2tf export) —
restores the best-by-drift-error checkpoint and writes a native flax-bytes
artifact, optionally plus a jax2tf TF SavedModel.

  python -m putting_dune_tpu.image_alignment.save_model \
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
  parser.add_argument('--image_size', type=int, default=128)
  parser.add_argument('--num_frames', type=int, default=5)
  parser.add_argument('--features', type=int, nargs='+',
                      default=[32, 64, 128, 256])
  parser.add_argument('--export_tf', action='store_true')
  args = parser.parse_args()

  import flax.serialization
  import jax

  from putting_dune_tpu.image_alignment import model as model_lib
  from putting_dune_tpu.image_alignment import train as train_lib

  config = train_lib.Config(
      workdir=args.workdir,
      features=tuple(args.features),
      image_size=args.image_size,
      num_frames=args.num_frames,
  )
  params = train_lib.load_params(args.workdir, config)

  os.makedirs(args.output_dir, exist_ok=True)
  with open(os.path.join(args.output_dir, 'params.msgpack'), 'wb') as f:
    f.write(flax.serialization.to_bytes(params))
  with open(os.path.join(args.output_dir, 'model.json'), 'w') as f:
    json.dump(
        {
            'kind': 'global_local_unet',
            'features': list(args.features),
            'image_size': args.image_size,
            'num_frames': args.num_frames,
        },
        f,
    )
  print(f'Saved native artifact to {args.output_dir}')

  if args.export_tf:
    from putting_dune_tpu.io import tf_export

    module = model_lib.GlobalLocalUNet(
        local_output_size=3 * args.num_frames,
        global_output_size=2 * args.num_frames,
        features=tuple(args.features),
    )

    def fn(image):
      local, global_out = module.apply({'params': params}, image)
      return local, global_out

    tf_export.export_tf_saved_model(
        jax.jit(fn),
        (1, args.image_size, args.image_size, args.num_frames),
        os.path.join(args.output_dir, 'tf_saved_model'),
        input_name='image',
    )
    print('Exported TF SavedModel.')


if __name__ == '__main__':
  main()
