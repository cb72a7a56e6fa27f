#!/bin/bash
# Train + test wrapper (reference experiments/scripts/train_faster_rcnn.sh).
# Usage: ./experiments/scripts/train_faster_rcnn.sh DATASET NET [--set ...]
#   DATASET in {pascal_voc, pascal_voc_0712, coco}
#   NET in {vgg16, res50, res101, res152, mobile}
set -x
set -e

export PYTHONUNBUFFERED="True"

DATASET=$1
NET=$2
array=( $@ )
len=${#array[@]}
EXTRA_ARGS=${array[@]:2:$len}
EXTRA_ARGS_SLUG=${EXTRA_ARGS// /_}

case ${DATASET} in
  pascal_voc)
    TRAIN_IMDB="voc_2007_trainval"
    TEST_IMDB="voc_2007_test"
    STEPSIZE="[50000]"
    ITERS=70000
    ANCHORS="[8,16,32]"
    RATIOS="[0.5,1,2]"
    ;;
  pascal_voc_0712)
    TRAIN_IMDB="voc_2007_trainval+voc_2012_trainval"
    TEST_IMDB="voc_2007_test"
    STEPSIZE="[80000]"
    ITERS=110000
    ANCHORS="[8,16,32]"
    RATIOS="[0.5,1,2]"
    ;;
  coco)
    TRAIN_IMDB="coco_2014_train+coco_2014_valminusminival"
    TEST_IMDB="coco_2014_minival"
    STEPSIZE="[350000]"
    ITERS=490000
    ANCHORS="[4,8,16,32]"
    RATIOS="[0.5,1,2]"
    ;;
  *)
    echo "No dataset given"
    exit 1
    ;;
esac

LOG="experiments/logs/${NET}_${TRAIN_IMDB}_${EXTRA_ARGS_SLUG}.txt.$(date +'%Y-%m-%d_%H-%M-%S')"
exec &> >(tee -a "$LOG")
echo Logging output to "$LOG"

python tools/trainval_net.py \
  --imdb ${TRAIN_IMDB} \
  --imdbval ${TEST_IMDB} \
  --iters ${ITERS} \
  --cfg experiments/cfgs/${NET}.yml \
  --net ${NET} \
  --set ANCHOR_SCALES ${ANCHORS} ANCHOR_RATIOS ${RATIOS} \
        TRAIN.STEPSIZE ${STEPSIZE} ${EXTRA_ARGS}

./experiments/scripts/test_faster_rcnn.sh $@
