"""Model-artifact bundles: zip archives with a hashed manifest.

The reference moves trained models between machines as zipped TF
SavedModels pulled from GCS (reference experiments/registry.py:94-108,
atom_detection/save_model.py:103-126, atom_detector.py:104-114). This
framework's artifacts are native checkpoint directories
(params.msgpack / policy.ckpt + metadata); this module is the transport
story for them — zero-egress, so archives move by whatever channel the
user has, and integrity comes from a sha256 manifest embedded in the
archive rather than from a trusted bucket.

CLI:
  python -m putting_dune_tpu.io.artifacts pack \
      --model_dir=experiments/model_weights/atom_detector \
      --archive=atom_detector.zip
  python -m putting_dune_tpu.io.artifacts unpack \
      --archive=atom_detector.zip --target_dir=/path/model_weights/
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import zipfile
from typing import Dict

MANIFEST_NAME = 'MANIFEST.json'
_FORMAT = 'putting_dune_tpu-artifact-v1'


def _sha256(path: str) -> str:
  h = hashlib.sha256()
  with open(path, 'rb') as f:
    for chunk in iter(lambda: f.read(1 << 20), b''):
      h.update(chunk)
  return h.hexdigest()


def build_manifest(model_dir: str) -> Dict:
  """Walks a model directory into {relpath: {sha256, bytes}} + metadata."""
  files = {}
  for root, _, names in os.walk(model_dir):
    for name in sorted(names):
      if name == MANIFEST_NAME:
        continue
      path = os.path.join(root, name)
      rel = os.path.relpath(path, model_dir)
      files[rel] = {
          'sha256': _sha256(path),
          'bytes': os.path.getsize(path),
      }
  if not files:
    raise ValueError(f'No files under {model_dir}')
  return {
      'format': _FORMAT,
      'name': os.path.basename(os.path.normpath(model_dir)),
      'files': files,
  }


def pack(model_dir: str, archive_path: str) -> Dict:
  """Zips a model directory with an embedded manifest; returns it."""
  manifest = build_manifest(model_dir)
  with zipfile.ZipFile(
      archive_path, 'w', compression=zipfile.ZIP_DEFLATED
  ) as zf:
    zf.writestr(MANIFEST_NAME, json.dumps(manifest, indent=2, sort_keys=True))
    for rel in manifest['files']:
      zf.write(os.path.join(model_dir, rel), rel)
  return manifest


def unpack(archive_path: str, target_dir: str, verify: bool = True) -> str:
  """Extracts an artifact under target_dir/<name>; verifies the manifest.

  Returns the extracted model directory. Raises ValueError on a missing
  or mismatched manifest entry (corrupt or tampered archive).
  """
  with zipfile.ZipFile(archive_path) as zf:
    try:
      manifest = json.loads(zf.read(MANIFEST_NAME))
    except KeyError as e:
      raise ValueError(
          f'{archive_path} has no {MANIFEST_NAME}; not a '
          f'{_FORMAT} archive'
      ) from e
    if manifest.get('format') != _FORMAT:
      raise ValueError(
          f"Unknown artifact format {manifest.get('format')!r}"
      )
    out_dir = os.path.join(target_dir, manifest['name'])
    os.makedirs(out_dir, exist_ok=True)
    names = set(zf.namelist()) - {MANIFEST_NAME}
    missing = set(manifest['files']) - names
    if missing:
      raise ValueError(f'Archive is missing manifest entries: {missing}')
    out_abs = os.path.abspath(out_dir)
    for rel, meta in manifest['files'].items():
      # Zip entries may use '/' separators; normalize + confine to out_dir.
      dest = os.path.abspath(os.path.normpath(os.path.join(out_dir, rel)))
      if not dest.startswith(out_abs + os.sep):
        raise ValueError(f'Unsafe path in archive: {rel}')
      os.makedirs(os.path.dirname(dest), exist_ok=True)
      with zf.open(rel) as src, open(dest, 'wb') as dst:
        dst.write(src.read())
      if verify:
        got = _sha256(dest)
        if got != meta['sha256']:
          raise ValueError(
              f'Hash mismatch for {rel}: manifest {meta["sha256"]}, '
              f'file {got}'
          )
  return out_dir


def main() -> None:
  parser = argparse.ArgumentParser(description=__doc__)
  sub = parser.add_subparsers(dest='cmd', required=True)
  p_pack = sub.add_parser('pack')
  p_pack.add_argument('--model_dir', required=True)
  p_pack.add_argument('--archive', required=True)
  p_unpack = sub.add_parser('unpack')
  p_unpack.add_argument('--archive', required=True)
  p_unpack.add_argument('--target_dir', required=True)
  p_unpack.add_argument(
      '--verify', action=argparse.BooleanOptionalAction, default=True
  )
  args = parser.parse_args()
  if args.cmd == 'pack':
    manifest = pack(args.model_dir, args.archive)
    print(
        f"Packed {manifest['name']} ({len(manifest['files'])} files) "
        f'-> {args.archive}'
    )
  else:
    out = unpack(args.archive, args.target_dir, verify=args.verify)
    print(f'Unpacked -> {out}')


if __name__ == '__main__':
  main()
