"""Make the repo root importable for scripts run as `python <dir>/<script>.py`
from any cwd (sys.path[0] is the script's own directory, which lets scripts
`import _pathfix`; the repo root, one level up, holds the package)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
