"""The devbook (docs/devbook.py) must stay runnable end-to-end.

The reference's test surface was notebook-driven eyeballing
(lddecode_devbook.ipynb — SURVEY.md §4); ours is automated, but the
interactive notebook still has to work, so run it headless and check
it renders every figure.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_devbook_runs_and_renders(tmp_path):
    outdir = str(tmp_path)
    env = dict(os.environ, LDD_DEVBOOK_CPU='1', MPLBACKEND='Agg',
               LDD_DEVBOOK_OUT=outdir)
    env.pop('DISPLAY', None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'docs', 'devbook.py')],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    for name in ('spectrum.png', 'lines_38_39.png', 'lineloc_diffs.png',
                 'raw_frame.png', 'rgb_preview.png'):
        p = os.path.join(outdir, name)
        assert os.path.exists(p) and os.path.getsize(p) > 1000, name
