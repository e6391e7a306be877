"""LARD prep script (scripts/prepare.py) end-to-end on a synthesized tree.

Mirrors the reference prep pipeline (reference: scripts/prepare.py:1-122):
corner quads -> enclosing xyxy boxes, drop missing images and >=max-size
boxes, one bbox txt per image with fictitious class 0, train/test link
lists in the format data/dataset.py consumes.
"""

import csv
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _write_csv(path: Path, rows):
    """rows: [(image_rel, quad_xs, quad_ys)]"""
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(
            f,
            fieldnames=[
                "image", "x_A", "y_A", "x_B", "y_B",
                "x_C", "y_C", "x_D", "y_D",
            ],
            delimiter=";",
        )
        w.writeheader()
        for image, xs, ys in rows:
            w.writerow(
                {
                    "image": image,
                    **{f"x_{c}": x for c, x in zip("ABCD", xs)},
                    **{f"y_{c}": y for c, y in zip("ABCD", ys)},
                }
            )


def test_prepare_end_to_end(tmp_path):
    root = tmp_path / "LARD"
    (root / "images").mkdir(parents=True)

    # Three train images: one normal quad, one missing from disk, one with
    # a >=448px box (must be dropped).
    _write_csv(
        root / "LARD_train.csv",
        [
            ("images/a.png", [10.6, 30, 20, 12.2], [5, 40.4, 18, 22]),
            ("images/missing.png", [0, 10, 10, 0], [0, 10, 10, 0]),
            ("images/big.png", [0, 500, 500, 0], [0, 500, 500, 0]),
        ],
    )
    for name in ("a.png", "big.png"):
        (root / "images" / name).write_bytes(b"png")

    # Test split comes from three CSVs in the LARD directory layout.
    synth = root / "LARD_test_synth"
    nominal = root / "LARD_test_real/LARD_test_real_nominal_cases"
    domain = root / "LARD_test_real/LARD_test_real_domain_adaptation"
    _write_csv(
        synth / "LARD_test_synth.csv",
        [("t1.png", [1, 2, 3, 4], [4, 3, 2, 1])],
    )
    _write_csv(nominal / "LARD_test_real_nominal_cases.csv", [])
    _write_csv(
        domain / "LARD_test_real_domain_adaptation.csv",
        [("t2.png", [7, 8, 9, 6], [6, 9, 8, 7])],
    )
    (synth / "t1.png").write_bytes(b"png")
    (domain / "t2.png").write_bytes(b"png")

    out = subprocess.run(
        [sys.executable, str(REPO / "scripts/prepare.py"),
         "--dataset-path", str(root)],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
    # Drop accounting is reported like the reference's progress messages.
    assert "non-existent images" in out.stdout
    assert "big bounding boxes" in out.stdout

    # Train list: only a.png survives (missing dropped, big dropped).
    train_lines = (root / "train.txt").read_text().splitlines()
    assert len(train_lines) == 1
    img_path, bbox_path = train_lines[0].split()
    assert img_path.endswith("images/a.png")
    # Enclosing box of the quad, rounded to ints, fictitious class 0.
    assert Path(bbox_path).read_text() == "0 11 5 30 40"

    # Test list: both surviving test images, from two different CSVs.
    test_lines = (root / "test.txt").read_text().splitlines()
    assert len(test_lines) == 2
    names = sorted(Path(l.split()[0]).name for l in test_lines)
    assert names == ["t1.png", "t2.png"]
    for line in test_lines:
        _, bpath = line.split()
        cls, x1, y1, x2, y2 = Path(bpath).read_text().split()
        assert cls == "0"
        assert int(x1) <= int(x2) and int(y1) <= int(y2)
