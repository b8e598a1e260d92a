# Build/test targets (the analog of the reference's feature-matrix Makefile).

.PHONY: test test-matrix bench interop clean examples

test:
	python -m pytest tests/ -q

# Re-runs the suite under {planar on/off} x {x64 on/off} + a precision-dial
# pass — the analog of the reference's scalar/SSE2/AVX2 feature matrix.
test-matrix:
	python tests/run_matrix.py

bench:
	python bench.py

interop:
	cmake -S interop -B interop/build -G Ninja
	cmake --build interop/build

examples:
	python examples/modulation.py /tmp
	python examples/bench_tables.py 5 /tmp/bench_tables.csv

clean:
	rm -rf interop/build
