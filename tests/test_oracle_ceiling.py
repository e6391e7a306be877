"""scripts/eval_oracle_ceiling.py end-to-end: the task-ceiling eval replays
oracle actions through the model eval pipeline (VERDICT r4 task 3; the
oracle is exactly what the reference's supervised trainer imitates,
reference: src/env/simple_env.py:481-588)."""

import json
import pathlib
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from jolineedle_tpu.data.toy import generate_toy_dataset

    import main

    toy_dir = generate_toy_dataset(
        tmp_path_factory.mktemp("toyds_oc"),
        n_train=4,
        n_test=2,
        image_size=(256, 320),
        seed=3,
        box_size=(20, 60),
    )
    work_dir = tmp_path_factory.mktemp("run_oc")
    # fmt: off
    cli_args = [
        "--seed", "7",
        "--dataset-dir", str(toy_dir),
        "--training-mode", "supervised",
        "--work-dir", str(work_dir),
        "--max-iters", "2",
        "--test-every", "2",
        "--test-samples", "1",
        "--env-name", "run",
        "--model-type", "gpt-nano",
        "--image-processor", "yolox-nano",
        "--concat-embeddings",
        "--decoder-pos-encoding",
        "--use-positional-embedding",
        "--max-seq-len", "4",
        "--batch-size", "2",
        "--patch-size", "64",
        "--minimum-image-size", "0",
        "--detector-conf-threshold", "0.05",
        "--merge-bboxes",
        "--devices", "0",
        "--max-det-patches", "6",
        "--max-boxes", "4",
        "--compute-dtype", "float32",
    ]
    # fmt: on
    main.main(main.get_args(cli_args))
    return work_dir / "run", toy_dir


def test_oracle_ceiling(trained_run, capsys):
    run_dir, toy_dir = trained_run
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import eval_oracle_ceiling
    finally:
        sys.path.pop(0)
    old_argv = sys.argv
    sys.argv = [
        "eval_oracle_ceiling.py", str(run_dir), "--ckpt", "last",
        "--dataset-dir", str(toy_dir),
    ]
    try:
        eval_oracle_ceiling.main()
    finally:
        sys.argv = old_argv
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("ORACLE-CEILING:")][-1]
    m = json.loads(line[len("ORACLE-CEILING:"):])
    assert m["n_images"] == 2
    # Episode length = test_max_seq_len positions, every episode.
    assert m["ep_len"] == 4.0
    assert np.isfinite(m["map"])
    # Oracle navigation must find patches at a rate a 2-iter model cannot;
    # on these tiny grids the greedy keypoint teacher finds most targets.
    assert m["prop_patches_found"] > 0.4
