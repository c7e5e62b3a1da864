# Runnable environment for pyprob_tpu (CPU backend; on TPU VMs install
# jax[tpu] instead).  Counterpart of the reference's Dockerfile, which
# builds on the pyprob_cpp image and runs the basic tests
# (reference: Dockerfile:1,14) — here the C++ PPX simulators are built
# in-tree, so no companion image is needed.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential libzmq5 libzmq3-dev && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /workspace/pyprob_tpu
COPY . .

RUN python -m pip install --upgrade pip && \
    pip install "jax[cpu]" optax pytest pytest-xdist numpy scipy \
        matplotlib pillow pyzmq scikit-learn pyyaml && \
    pip install -e .

RUN make -C cpp -j2

CMD ["bash", "tests/run_basic.sh"]
