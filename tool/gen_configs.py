"""Generate the experiment config matrix (12 YAMLs).

Keeps the exact option schema of the reference configs
(``config/<dataset>/<dataset>_<arch><layers>.yaml`` with
DATA/TRAIN/Distributed/TEST sections, reference ``util/config.py:60-73``
flattening) so ``KEY VALUE`` overrides and train.sh/test.sh recipes work
unchanged. Hyperparameters follow the published recipes (reference
README.md:91-124).
"""

import os

DATASETS = {
    "ade20k": dict(
        classes=150,
        epochs=100,
        base_size=512,
        train_list="dataset/ade20k/list/training.txt",
        val_list="dataset/ade20k/list/validation.txt",
        crop_psp=473,
        crop_psa=465,
    ),
    "voc2012": dict(
        classes=21,
        epochs=50,
        base_size=512,
        train_list="dataset/voc2012/list/train_aug.txt",
        val_list="dataset/voc2012/list/val.txt",
        crop_psp=473,
        crop_psa=465,
    ),
    "cityscapes": dict(
        classes=19,
        epochs=200,
        base_size=2048,
        train_list="dataset/cityscapes/list/fine_train.txt",
        val_list="dataset/cityscapes/list/fine_val.txt",
        crop_psp=713,
        crop_psa=705,
    ),
}

PSA_BLOCK = """\
  psa_type: 2  # 0-collect, 1-distribute, 2-bi-direction
  compact: 0  # 0-no, 1-yes
  shrink_factor: 2  # shrink factor when computing the attention mask
  mask_h:  # optional explicit mask h (odd, >=3); default derives from crop
  mask_w:  # optional explicit mask w
  normalization_factor: 1.0  # normalization factor for aggregation
  psa_softmax: 1  # softmax on mask or not: 0-no, 1-yes
"""

TEMPLATE = """\
DATA:
  data_root: dataset/{dataset}
  train_list: {train_list}
  val_list: {val_list}
  classes: {classes}

TRAIN:
  arch: {arch}
  layers: {layers}
  sync_bn: True  # cross-replica batch norm over the data mesh axis
  train_h: {crop}
  train_w: {crop}
  scale_min: 0.5  # minimum random scale
  scale_max: 2.0  # maximum random scale
  rotate_min: -10  # minimum random rotate
  rotate_max: 10  # maximum random rotate
  zoom_factor: 8  # zoom factor for final prediction during training, in [1, 2, 4, 8]
  ignore_label: 255
  aux_weight: 0.4
{psa_block}\
  train_gpu: [0, 1, 2, 3, 4, 5, 6, 7]  # device ordinals (chips); length sets expected device count
  workers: 16  # host data-loader workers
  batch_size: 16  # global batch size for training
  batch_size_val: 8  # global batch size for validation during training
  base_lr: 0.01
  epochs: {epochs}
  start_epoch: 0
  power: 0.9
  momentum: 0.9
  weight_decay: 0.0001
  manual_seed:
  print_freq: 10
  save_freq: 1
  save_path: exp/{dataset}/{exp}/model
  weight:  # path to initial weight (default: none)
  resume:  # path to latest checkpoint (default: none)
  evaluate: False  # evaluate on validation set during training
Distributed:
  dist_url: tcp://127.0.0.1:6789  # multi-host coordinator address (jax.distributed)
  dist_backend: 'xla'  # collectives are compiled by XLA onto ICI/DCN
  multiprocessing_distributed: True
  world_size: 1
  rank: 0

TEST:
  test_list: {val_list}
  split: val  # split in [train, val and test]
  base_size: {base_size}  # base size for scaling
  test_h: {crop}
  test_w: {crop}
  scales: [1.0]  # evaluation scales, ms as [0.5, 0.75, 1.0, 1.25, 1.5, 1.75]
  has_prediction: False  # has prediction already or not
  index_start: 0  # evaluation start index in list
  index_step: 0  # evaluation step index in list, 0 means to end
  test_gpu: [0]
  model_path: exp/{dataset}/{exp}/model/train_epoch_{epochs}.ckpt  # evaluation model path (.pth torch checkpoints are auto-converted)
  save_folder: exp/{dataset}/{exp}/result/epoch_{epochs}/val/ss  # results save folder
  colors_path: data/{dataset}/{dataset}_colors.txt  # dataset palette
  names_path: data/{dataset}/{dataset}_names.txt  # dataset category names
"""


def main():
    root = os.path.join(os.path.dirname(__file__), "..", "config")
    for dataset, spec in DATASETS.items():
        for arch in ("psp", "psa"):
            for layers in (50, 101):
                exp = f"{'pspnet' if arch == 'psp' else 'psanet'}{layers}"
                crop = spec["crop_psp"] if arch == "psp" else spec["crop_psa"]
                text = TEMPLATE.format(
                    dataset=dataset,
                    arch=arch,
                    layers=layers,
                    exp=exp,
                    crop=crop,
                    psa_block=PSA_BLOCK if arch == "psa" else "",
                    **{
                        k: spec[k]
                        for k in (
                            "classes",
                            "epochs",
                            "base_size",
                            "train_list",
                            "val_list",
                        )
                    },
                )
                path = os.path.join(root, dataset, f"{dataset}_{exp}.yaml")
                os.makedirs(os.path.dirname(path), exist_ok=True)
                with open(path, "w") as f:
                    f.write(text)
                print("wrote", path)


if __name__ == "__main__":
    main()
