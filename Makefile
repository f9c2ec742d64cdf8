# Developer entry points (the reference ships Makefiles; ours is thin
# because the package is pure Python + an on-demand g++ native lib).

.PHONY: test bench native clean encode-corpus analyze-corpus tpu-parity

test:
	python -m pytest tests/ -q

# On-silicon byte-parity gate: re-runs every production path's
# device-vs-host-coder byte comparison on the REAL TPU (Mosaic lowering,
# MXU rounding). Single process (-n0): the tunneled chip serializes anyway.
tpu-parity:
	JPEGTPU_TPU=1 python -m pytest tests/test_tpu_parity.py -q -n0 -m tpu

bench:
	python bench.py

native:
	python -c "from jpegtpu import native; assert native.available(); print('native runtime OK')"

# Encode the reference corpus and analyze against the originals
# (the reference's run_analysis.sh workflow, end to end).
encode-corpus:
	mkdir -p out/corpus
	@for f in /root/reference/assets/input/*.bmp; do \
	  n=$$(basename $$f .bmp); \
	  python -m jpegtpu.cli encode $$f out/corpus/$$n.jpeg --stats; \
	done

analyze-corpus:
	python -m jpegtpu.cli analyze-dir /root/reference/assets/input out/corpus -d out/difference

clean:
	rm -rf out jpegtpu/native/_bitpack.so
