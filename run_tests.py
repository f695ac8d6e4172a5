#!/usr/bin/env python
"""Deterministic full-suite runner: one fresh interpreter per test file.

`python -m pytest tests/ -q` in ONE process accumulates XLA CPU compile
state across ~30 heavyweight modules and has been observed to segfault
(RC=139) mid-suite even though every file passes in isolation. This
runner is the documented suite entry point: it executes each test file in
its own subprocess (fresh interpreter, fresh XLA state), serially by
default, and fails iff any file fails. CI and humans should use this.

Usage:
  python run_tests.py                 # full suite, serial
  python run_tests.py -j 2            # two files at a time
  python run_tests.py tests/test_kmc.py tests/test_env.py   # subset
  python run_tests.py -- -k pattern   # extra pytest args after --
"""

from __future__ import annotations

import argparse
import concurrent.futures
import glob
import os
import subprocess
import sys
import time

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))


def run_file(path: str, pytest_args: list[str]) -> tuple[str, int, str, float]:
  """Runs one test file in a fresh interpreter; returns (path, rc, tail, s)."""
  t0 = time.perf_counter()
  proc = subprocess.run(
      [sys.executable, '-m', 'pytest', path, '-q', *pytest_args],
      cwd=REPO_ROOT,
      stdout=subprocess.PIPE,
      stderr=subprocess.STDOUT,
      text=True,
  )
  dt = time.perf_counter() - t0
  tail = '\n'.join(proc.stdout.strip().splitlines()[-15:])
  return path, proc.returncode, tail, dt


def main() -> int:
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('files', nargs='*', help='test files (default: all)')
  parser.add_argument('-j', '--jobs', type=int, default=1,
                      help='concurrent files (default 1: serial — CPU '
                           'contention makes parallel runs slower per file)')
  # Extra pytest args come after '--' (argparse can't express "files then
  # -- then pytest args" cleanly; split manually).
  argv = sys.argv[1:]
  extra: list[str] = []
  if '--' in argv:
    split = argv.index('--')
    argv, extra = argv[:split], argv[split + 1:]
  args = parser.parse_args(argv)

  files = args.files or sorted(
      glob.glob(os.path.join(REPO_ROOT, 'tests', 'test_*.py'))
  )
  files = [os.path.relpath(f, REPO_ROOT) for f in files]

  t0 = time.perf_counter()
  results = []
  # pytest exit code 5 = "no tests collected" — only acceptable when the
  # caller filtered with -k.
  ok_codes = {0, 5} if any(a.startswith('-k') for a in extra) else {0}
  if args.jobs <= 1:
    for f in files:
      path, rc, tail, dt = run_file(f, extra)
      status = 'ok' if rc in ok_codes else f'FAIL(rc={rc})'
      print(f'[{len(results) + 1:2d}/{len(files)}] {status:12s} '
            f'{dt:6.1f}s  {path}', flush=True)
      if rc not in ok_codes:
        print(tail, flush=True)
      results.append((path, rc))
  else:
    with concurrent.futures.ThreadPoolExecutor(args.jobs) as pool:
      futures = {pool.submit(run_file, f, extra): f for f in files}
      for fut in concurrent.futures.as_completed(futures):
        path, rc, tail, dt = fut.result()
        status = 'ok' if rc in ok_codes else f'FAIL(rc={rc})'
        print(f'[{len(results) + 1:2d}/{len(files)}] {status:12s} '
              f'{dt:6.1f}s  {path}', flush=True)
        if rc not in ok_codes:
          print(tail, flush=True)
        results.append((path, rc))

  failed = [(p, rc) for p, rc in results if rc not in ok_codes]
  total = time.perf_counter() - t0
  print(f'\n{len(results) - len(failed)}/{len(results)} files green '
        f'in {total / 60:.1f} min')
  for p, rc in failed:
    print(f'  FAILED rc={rc}: {p}')
  return 1 if failed else 0


if __name__ == '__main__':
  sys.exit(main())
