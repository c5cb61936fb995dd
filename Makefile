.PHONY: test test-fast bench bench-stress native clean example

test:            ## full suite on the 8-virtual-device CPU mesh
	python -m pytest tests/ -q

test-fast:       ## skip the slow real-data integration tests
	python -m pytest tests/ -q -m "not slow"

bench:           ## chr21-scale EM-iteration benchmark (one JSON line)
	python bench.py

bench-stress:    ## 10kb-resolution scale (3264^2 grid)
	python bench.py --stress

native:          ## force-rebuild the C++ host components
	python -c "from phylo_hmrf_tpu import native; print(native.build(force=True))"

example:         ## generate + run the synthetic 2-chromosome example
	python examples/make_synthetic_example.py --out example_synth
	python -m phylo_hmrf_tpu.cli -n 5 -p example_synth --chromvec 21,22 \
	    --miter 10 --output out_synth

clean:
	rm -rf phylo_hmrf_tpu/native/*.so .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
