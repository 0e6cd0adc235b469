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


@pytest.mark.slow
def test_train_cli_2d(tmp_path):
    """2D slice-training pathway end-to-end: SliceDataset -> resunet_2d ->
    depth-1 loss lift -> checkpoint (reference --dimension 2d, which ships
    models but no dataset/loop)."""
    tmp = tmp_path
    mask_dir = tmp/'masks'; mask_dir.mkdir()
    _make_mask_case(mask_dir, 'BDMAP_A')
    json.dump(list(CLASSES), open(mask_dir/'classes.json','w'))
    yaml.safe_dump({
    'training_size': [32, 32],
    'model_args': {'base_chan': 4},
    'compute_dtype': 'float32',
    'num_workers': 2,
    }, open(tmp/'small2d.yaml', 'w'))

    import train as train_cli
    train_cli.main([
    '--preset','slices/resunet_2d', '--config', str(tmp/'small2d.yaml'),
    '--data_root', str(mask_dir),
    '--batch_size','2','--iter_per_epoch','2','--epochs','1',
    '--unique_name','cli2d','--cp_path',str(tmp/'exp'),
    '--all_train','--max_steps','2',
    ])
    assert (tmp/'exp/cli2d/latest').exists()


@pytest.mark.slow
def test_train_cli_clip_pretrain(tmp_path):
    """CLIP pretraining through the CLI: organ-homogeneous batches
    (OrganBatchSampler) + report embeddings + InfoNCE-only step
    (reference --clip_pretrain, train_ddp.py:450-451 + sampler_clip.py)."""
    tmp = tmp_path
    rep_dir = tmp/'reports'; rep_dir.mkdir()
    _make_report_case(rep_dir, 'BDMAP_R')
    _make_report_case(rep_dir, 'BDMAP_S')
    json.dump(list(REPORT_CLASSES), open(rep_dir/'classes.json','w'))
    rows = _report_rows()
    rows2 = rows.copy(); rows2['BDMAP_ID'] = 'BDMAP_S'
    import pandas as pd
    pd.concat([rows, rows2]).to_csv(tmp/'per_tumor.csv', index=False)
    emb_dir = tmp/'emb'; emb_dir.mkdir()
    rng = np.random.default_rng(0)
    for cid in ('BDMAP_R', 'BDMAP_S'):
        np.save(emb_dir/f'{cid}.npy', rng.normal(size=(8,)).astype(np.float32))

    yaml.safe_dump({
    'classes': list(REPORT_CLASSES),
    'training_size': [32, 32, 32],
    'arch': 'medformer',
    'model_args': {'base_chan': 4, 'chan_num': [8, 16, 16, 16, 16, 16, 8, 4],
                   'num_heads': [1, 2, 2, 2, 2, 2, 1, 1], 'fusion_dim': 16,
                   'fusion_heads': 2, 'trans_num': [0, 1, 1, 1, 1, 1, 0, 0],
                   'conv_num': [1, 0, 0, 0, 0, 0, 1, 1], 'clip_feats': 8},
    'compute_dtype': 'float32',
    'num_workers': 2,
    'scale': [0.0, 0.0, 0.0],
    'rotate': [0.0, 0.0, 0.0],
    }, open(tmp/'clip.yaml', 'w'))

    import train as train_cli
    train_cli.main([
    '--preset','abdomenatlas_ufo/medformer_3d', '--config', str(tmp/'clip.yaml'),
    '--report_root', str(rep_dir),
    '--reports', str(tmp/'per_tumor.csv'),
    '--clip_pretrain', '--clip_source', str(emb_dir),
    '--batch_size','2','--iter_per_epoch','2','--epochs','1',
    '--unique_name','clip_test','--cp_path',str(tmp/'exp'),
    '--all_train','--max_steps','2',
    ])
    assert (tmp/'exp/clip_test/latest').exists()



@pytest.mark.slow
def test_train_cli_kfold_summary(tmp_path):
    """--k_fold: each fold trains into <name>_fold<i>/, writes
    fold_results.json, and the last fold emits the cross_validation summary
    (reference train_ddp.py:751-779)."""
    tmp = tmp_path
    mask_dir = tmp/'masks'; mask_dir.mkdir()
    for cid in ('BDMAP_A', 'BDMAP_B'):
        _make_mask_case(mask_dir, cid)
    json.dump(list(CLASSES), open(mask_dir/'classes.json','w'))
    yaml.safe_dump({
        'training_size': [32, 32, 32],
        'model_args': {'base_chan': 4, 'block': 'BasicBlock', 'norm': 'in'},
        'compute_dtype': 'float32',
        'num_workers': 2,
        'scale': [0.0, 0.0, 0.0],
        'rotate': [0.0, 0.0, 0.0],
        'val_freq': 0,
    }, open(tmp/'small.yaml', 'w'))

    import train as train_cli
    for fold in range(2):
        train_cli.main([
            '--preset','abdomenatlas/resunet_3d','--config',str(tmp/'small.yaml'),
            '--data_root', str(mask_dir),
            '--batch_size','2','--iter_per_epoch','1','--epochs','1',
            '--unique_name','kf','--cp_path',str(tmp/'exp'),
            '--k_fold','2','--fold',str(fold),
            '--loss','dice','--max_steps','1',
        ])
        assert (tmp/f'exp/kf_fold{fold}/fold_results.json').exists()
    summary = tmp/'exp/kf_cross_validation.txt'
    assert summary.exists()
    text = summary.read_text()
    assert 'dice' in text and '±' in text
