"""One-time golden generation for t3 (run deliberately, never in CI):
``python -m tests.gen_goldens``"""

import json

from tests.test_extract import GOLDEN_PATH, _compute_goldens

if __name__ == "__main__":
    with open(GOLDEN_PATH, "w") as f:
        json.dump(_compute_goldens(), f, indent=0, sort_keys=True)
    print(f"wrote {GOLDEN_PATH}")
