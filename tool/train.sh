#!/bin/sh
# usage: sh tool/train.sh <dataset> <exp_name>
# Mirrors the reference launch convention: snapshot code + config into
# exp/<dataset>/<exp_name>/, run training from the snapshot, then test,
# teeing logs with a timestamp.

export PYTHONPATH=./

eval "$(conda shell.bash hook 2>/dev/null)" 2>/dev/null || true

dataset=$1
exp_name=$2
exp_dir=exp/${dataset}/${exp_name}
model_dir=${exp_dir}/model
result_dir=${exp_dir}/result
config=config/${dataset}/${dataset}_${exp_name}.yaml
now=$(date +"%Y%m%d_%H%M%S")

mkdir -p "${model_dir}" "${result_dir}"
cp tool/train.sh tool/train.py tool/test.py "${config}" "${exp_dir}"

python "${exp_dir}/train.py" --config="${config}" 2>&1 | tee "${model_dir}/train-${now}.log"
python "${exp_dir}/test.py" --config="${config}" 2>&1 | tee "${result_dir}/test-${now}.log"
