"""CSV logger column-alignment tests.

Regression test for the bug surfaced by the round-5 500-epoch protocol
run: validation metrics must land under their own headers. (The reference
itself writes five blanks under its six train columns —
Trainer_prototype_full.py:214-215 — shifting every validation metric one
column left; the rebuild fixes that, documented in
utils/logging.py:write_valid_row.)
"""

import csv

from uda_clr_tpu.utils.logging import CsvLogger


def test_valid_row_columns_align_with_headers(tmp_path):
    logger = CsvLogger(str(tmp_path))
    logger.write_valid_row(3, 41, 0.25, 0.81, 0.92, best_epoch=4)
    rows = list(csv.DictReader(open(tmp_path / "log.csv")))
    (r,) = rows
    assert r["epoch"] == "3" and r["iteration"] == "41"
    # the six train columns stay blank on a validation row
    for k in ("train/loss_seg", "train/cup_dice", "train/disc_dice",
              "train/loss_adv", "train/loss_D_same", "train/loss_D_diff"):
        assert r[k] == "", k
    assert float(r["valid/loss_CE"]) == 0.25
    assert float(r["valid/cup_dice"]) == 0.81
    assert float(r["valid/disc_dice"]) == 0.92
    # elapsed under its own header (a small wall-clock float, not a metric)
    assert 0.0 <= float(r["elapsed_time"]) < 60.0
    # the best-model note is the 13th overflow cell (reference format)
    raw = open(tmp_path / "log.csv").read().splitlines()[1]
    assert raw.split(",")[12] == "best model epoch: 4"


def test_train_row_columns_align_with_headers(tmp_path):
    logger = CsvLogger(str(tmp_path))
    logger.write_train_rows([{
        "epoch": 1, "iteration": 7, "loss_seg": 0.5, "cup_dice": 0.7,
        "disc_dice": 0.8, "loss_adv": 0.01, "loss_D": 1.38, "loss_D2": 1.39,
    }])
    (r,) = list(csv.DictReader(open(tmp_path / "log.csv")))
    assert float(r["train/loss_seg"]) == 0.5
    assert float(r["train/loss_D_same"]) == 1.38
    assert float(r["train/loss_D_diff"]) == 1.39
    for k in ("valid/loss_CE", "valid/cup_dice", "valid/disc_dice"):
        assert r[k] == "", k
    assert float(r["elapsed_time"]) >= 0.0
