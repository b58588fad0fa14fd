# facegen — TPU-native face-generator framework.
#
# `make demo-lfw LFW_DIR=/path/to/lfw` is the full real-data workflow
# (README.md:49-54 of the reference): raw LFW tree -> packed uint8 store
# -> 500-epoch GAN run -> sample grids -> quality report. Each stage is
# also callable on its own. With no LFW tree available, `make demo`
# runs the identical pipeline on the procedural synthetic dataset.

LFW_DIR   ?= dataset/lfw
STORE     ?= dataset/lfw64.npy
REFGRID   ?= /root/reference/images/color_random1024.jpg
SAVE      ?= logs
SAMPLES   ?= samples
EPOCHS    ?= 500
SCALE     ?= 32
BATCH     ?= 32
PY        ?= python

.PHONY: demo-lfw demo dataset train sample report test quick-test test-fast bench headtohead demo-refgrid

dataset:
	$(PY) -m facegen.data.lfw --path=$(LFW_DIR) --out=$(STORE)

train:
	$(PY) train.py --scale $(SCALE) --batchSize $(BATCH) --epochs $(EPOCHS) \
	    --save $(SAVE) --datasetDir $(STORE) --D_L1 0 --D_L2 0 --D_iterations 2

sample:
	$(PY) sample.py --save_base $(SAVE) --scale $(SCALE) --writeto $(SAMPLES) \
	    --neighbours --runs 2

report:
	$(PY) -m facegen.eval.parity --network_a $(SAVE)/adversarial \
	    --scale $(SCALE) --data $(STORE) --n 1024 --out $(SAVE)/parity.json

demo-lfw: dataset train sample report
	@echo "demo-lfw complete: checkpoints in $(SAVE)/, grids in $(SAMPLES)/, quality report in $(SAVE)/parity.json"

# Apples-to-apples quality parity vs the reference WITHOUT an LFW tree:
# slice the reference's own published 1024-sample grid into a training
# store, train the reference's published-images config on it, then score
# our samples against the reference's samples with ONE shared training
# distribution (docs/ROUND3.md section 1; report fields where the
# comparison is meaningful: nn_distance + calibration, frechet_pixels).
demo-refgrid:
	$(PY) -m facegen.eval.refgrid --grid $(REFGRID) --out dataset/refgrid64.npy
	$(PY) train.py --datasetDir dataset/refgrid64.npy --D_L1 0 --D_L2 0 \
	    --D_iterations 2 --epochs 5000 --epochsPerCompile 50 --noplot \
	    --save logs/refgrid
	$(PY) sample.py --save_base logs/refgrid --writeto samples/refgrid \
	    --neighbours --datasetDir dataset/refgrid64.npy --runs 1
	$(PY) -m facegen.eval.parity --network_a logs/refgrid/adversarial \
	    --samples_b $(REFGRID) --data dataset/refgrid64.npy \
	    --out logs/refgrid/parity_vs_reference.json

# Head-to-head quality run (docs/ROUND4.md section 1): build the
# reference's offline augmentation regime over the refgrid tiles
# (1 original + 19 augmentations, generate_dataset.py:29-30), train the
# config-matched torch-CPU reference proxy AND facegen on that SAME
# store under the published-images config, then score both sample
# populations at matched image budgets (+ noise floor, symmetric
# proxy-D embedding, equal-wallclock row). The proxy is the long pole:
# hours per hundred epochs on one CPU core vs ~7 min for facegen's
# whole 400-epoch run on one TPU chip.
headtohead:
	$(PY) tools/make_proxy_store.py --out dataset/refgrid_aug32.npy
	$(PY) tools/train_torch_proxy.py --store dataset/refgrid_aug32.npy \
	    --save logs/proxy_headtohead --epochs 400 --snapshotFreq 10
	$(PY) tools/train_facegen_headtohead.py --store dataset/refgrid_aug32.npy \
	    --save logs/facegen_headtohead --epochs 400 --snap 10
	for s in 2 3 4 5; do \
	    $(PY) tools/train_facegen_headtohead.py --store dataset/refgrid_aug32.npy \
	        --save logs/facegen_h2h_seed$$s --epochs 50 --snap 10 --seed $$s \
	        || exit 1; done
	$(PY) tools/train_facegen_headtohead.py --store dataset/refgrid_aug32.npy \
	    --save logs/facegen_h2h_fp32 --epochs 50 --snap 10 --dtype float32
	$(PY) tools/headtohead_report.py --out docs/artifacts/parity_headtohead.json \
	    --grids docs/artifacts/r4_headtohead \
	    --variant seed2=logs/facegen_h2h_seed2 --variant seed3=logs/facegen_h2h_seed3 \
	    --variant seed4=logs/facegen_h2h_seed4 --variant seed5=logs/facegen_h2h_seed5 \
	    --variant fp32=logs/facegen_h2h_fp32

# identical pipeline, procedural data (no LFW needed)
demo:
	$(PY) train.py --scale $(SCALE) --batchSize $(BATCH) --epochs $(EPOCHS) \
	    --save $(SAVE) --syntheticData --D_L1 0 --D_L2 0 --D_iterations 2
	$(PY) sample.py --save_base $(SAVE) --scale $(SCALE) --writeto $(SAMPLES) --runs 2
	$(PY) -m facegen.eval.parity --network_a $(SAVE)/adversarial \
	    --scale $(SCALE) --synthetic --n 1024 --out $(SAVE)/parity.json

test:
	$(PY) -m pytest tests/ -q

# <5 min cold: one or two tests per subsystem (tier list in tests/conftest.py)
quick-test:
	$(PY) -m pytest tests/ -q -m smoke

# full suite minus the multi-process / long-compile tail
test-fast:
	$(PY) -m pytest tests/ -q -m "not slow"

bench:
	$(PY) bench.py
