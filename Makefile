# Developer entry points.

.PHONY: test bench bench-quick native clean

native:
	$(MAKE) -C vector_indexer_tpu/storage/native

test: native
	python -m pytest tests/ -x -q

bench: native
	python bench.py --full

bench-quick: native
	python bench.py --quick

clean:
	$(MAKE) -C vector_indexer_tpu/storage/native clean
	# Only scratch outputs; committed artifacts (sift1m, scale4m, ...) stay.
	rm -rf bench_results/run bench_results/sweep bench_results/sweep.json \
	       bench_results/sweep.md
