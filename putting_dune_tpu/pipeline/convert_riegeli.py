"""Converts riegeli record files to/from TFRecord, record-for-record.

The reference's upload pipeline emits riegeli records
(reference pipeline/upload_microscope_data.py:32,223-244), which are
brotli-compressed by default. This framework's native record codec is
TFRecord (native/tfrecord.cc); neither the `riegeli` package nor a brotli
codec is available in the zero-egress TPU image, so reference-produced
riegeli datasets need a ONE-TIME conversion run in an environment where
`riegeli` is installed (e.g. the reference's own environment — this script
has no other dependency on that side, records are rewrapped byte-for-byte
without being parsed):

  python -m putting_dune_tpu.pipeline.convert_riegeli \
      --source_path=trajectories.riegeli --target_path=trajectories.tfrecords

The reverse direction (.tfrecords -> .riegeli, for handing data back to
reference tooling) works the same way and also requires `riegeli`.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

from putting_dune_tpu.io import records


@dataclasses.dataclass
class Args:
  source_path: str
  target_path: str


def convert(source_path: str, target_path: str) -> int:
  """Rewraps records byte-for-byte; returns the record count."""
  payloads = records.read_records(source_path)
  records.write_records(target_path, payloads)
  return len(payloads)


def main(args: Args) -> None:
  src_ext = os.path.splitext(args.source_path)[1]
  dst_ext = os.path.splitext(args.target_path)[1]
  if '.riegeli' not in (src_ext, dst_ext):
    raise ValueError(
        'One of source/target must be .riegeli '
        f'(got {src_ext} -> {dst_ext}).'
    )
  n = convert(args.source_path, args.target_path)
  print(f'Converted {n} records: {args.source_path} -> {args.target_path}')


def _parse_args() -> Args:
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--source_path', required=True)
  parser.add_argument('--target_path', required=True)
  return Args(**vars(parser.parse_args()))


if __name__ == '__main__':
  main(_parse_args())
