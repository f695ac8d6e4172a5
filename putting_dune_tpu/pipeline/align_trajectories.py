"""Applies the learned ImageAligner over recorded trajectories.

Parity: /root/reference/putting_dune/pipeline/align_trajectories.py:47-113 —
per-trajectory iterative alignment accumulating FOV shifts, with optional
multi-pass step-size schedules, relabeling, and hybrid ICP postprocessing.
The aligner loads from a native orbax checkpoint directory instead of a TF
SavedModel zip.

CLI:
  python -m putting_dune_tpu.pipeline.align_trajectories \
      --source_path=in.tfrecords --target_path=out.tfrecords \
      --aligner_workdir=/path/to/image_alignment_run
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np

from putting_dune_tpu import microscope_data as md
from putting_dune_tpu.image_alignment import inference as aligner_lib
from putting_dune_tpu.io import records


@dataclasses.dataclass
class Args:
  source_path: str
  target_path: str
  aligner_workdir: str
  history_length: int = 5
  alignment_iterations: int = 1
  base_step_size: float = 1.0
  hybrid: bool = False
  relabel: bool = False


def do_alignment(
    trajectory: md.Trajectory,
    args: Args,
    aligner: aligner_lib.ImageAligner,
) -> md.Trajectory:
  """Aligns one trajectory, accumulating FOV drift corrections."""
  n_iters = args.alignment_iterations
  for i in range(1, n_iters + 1):
    aligned = []
    cumulative_shift = np.zeros(2)
    step_size = args.base_step_size + (1 - args.base_step_size) * i / n_iters
    aligner.reset()

    for obs in trajectory.observations:
      shifted_fov = obs.fov.shift(-cumulative_shift)
      extracted_grid, new_shift, _ = aligner(obs.image, shifted_fov)
      # Sign divergence from the reference (:76): our aligner is trained
      # on image_alignment/data.py labels = the TRUE view's cumulative
      # drift relative to the claimed FOV (truth - claim). The correction
      # must therefore move the claim TOWARD the prediction, i.e.
      # subtract here so fov.shift(-cumulative) adds the recovered drift.
      # Accumulating with '+' (the reference's convention for its
      # opposite-signed labels) doubles the residual every frame and
      # diverges — caught by
      # tests/test_pipeline.py::test_align_trajectories_recovers_fov_drift.
      cumulative_shift = cumulative_shift - new_shift * step_size
      shifted_fov = obs.fov.shift(-cumulative_shift)
      # Write the corrected claim back into the aligner's history so the
      # next frame's prediction is anchored on a truth-registered stack
      # (see ImageAligner.amend_last_fov), and re-correct the surviving
      # history claims from this stack's per-frame heads so old claim
      # errors are re-measured instead of random-walking.
      aligner.amend_last_fov(shifted_fov)
      aligner.refine_history_claims()
      aligned.append(
          md.MicroscopeObservation(
              grid=extracted_grid if args.relabel else obs.grid,
              fov=shifted_fov,
              controls=obs.controls,
              elapsed_time=obs.elapsed_time,
              image=obs.image,
              label_image=obs.label_image,
          )
      )
    trajectory = md.Trajectory(tuple(aligned))
  return trajectory


def main(args: Args) -> None:
  trajectories = records.read_records(args.source_path, md.Trajectory)
  aligner = aligner_lib.ImageAligner.from_checkpoint(
      args.aligner_workdir,
      history_length=args.history_length,
      hybrid=args.hybrid,
  )
  aligned = [do_alignment(t, args, aligner) for t in trajectories]
  records.write_records(args.target_path, aligned)
  print(f'Aligned {len(aligned)} trajectories -> {args.target_path}')


def _parse_args() -> Args:
  parser = argparse.ArgumentParser(description=__doc__)
  for field in dataclasses.fields(Args):
    name = f'--{field.name}'
    if isinstance(field.default, bool):
      parser.add_argument(
          name, action=argparse.BooleanOptionalAction, default=field.default
      )
    elif field.default is dataclasses.MISSING:
      parser.add_argument(name, required=True)
    else:
      parser.add_argument(
          name, type=type(field.default), default=field.default
      )
  return Args(**vars(parser.parse_args()))


def cli() -> None:
  """Console entry point."""
  main(_parse_args())


if __name__ == '__main__':
  cli()
