"""Integration test of the train.py CLI: preset+YAML merge, case discovery,
report filtering, balanced case list, mesh auto-sizing, checkpoint write."""

import json
import pathlib

import numpy as np
import pytest
import yaml

from tests.test_data import (
    CLASSES,
    REPORT_CLASSES,
    _make_mask_case,
    _make_report_case,
    _report_rows,
)


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    tmp = tmp_path
    mask_dir = tmp/'masks'; mask_dir.mkdir(); rep_dir = tmp/'reports'; rep_dir.mkdir()
    _make_mask_case(mask_dir, 'BDMAP_A')
    _make_report_case(rep_dir, 'BDMAP_R')
    json.dump(list(CLASSES), open(mask_dir/'classes.json','w'))
    json.dump(list(REPORT_CLASSES), open(rep_dir/'classes.json','w'))
    _report_rows().to_csv(tmp/'per_tumor.csv', index=False)

    yaml.safe_dump({
    'training_size': [32, 32, 32],
    'model_args': {'base_chan': 4, 'block': 'BasicBlock', 'norm': 'in'},
    'compute_dtype': 'float32',
    'num_workers': 2,
    'scale': [0.0, 0.0, 0.0],
    'rotate': [0.0, 0.0, 0.0],
    }, open(tmp/'small.yaml', 'w'))

    import train as train_cli
    train_cli.main([
    '--preset','abdomenatlas/resunet_3d', '--config', str(tmp/'small.yaml'),
    '--data_root', str(mask_dir), '--report_root', str(rep_dir),
    '--reports', str(tmp/'per_tumor.csv'),
    '--batch_size','2','--iter_per_epoch','2','--epochs','1',
    '--unique_name','cli_test','--cp_path',str(tmp/'exp'),
    '--all_train','--max_steps','2',
    '--loss','dice',
    ])
    assert (tmp/'exp/cli_test/latest').exists()

