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

.PHONY: demo-lfw demo dataset train sample report test quick-test bench

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
