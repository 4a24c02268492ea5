"""Config 3 (BASELINE.md:23): fused segment -> dilate -> inpaint,
batch=8 — the headline. Delegates to the repo-root ``bench.py`` so the
driver-run number and this suite can never diverge."""

import runpy
import sys
from pathlib import Path

if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    runpy.run_path(str(Path(__file__).resolve().parent.parent / "bench.py"),
                   run_name="__main__")
