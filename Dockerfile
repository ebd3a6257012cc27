# Runtime images for collision-tpu, mirroring the reference's two-variant
# layout (/root/reference/Dockerfile: one venv build stage, then `nvidia`
# and `cpu` runtimes). Here the variants are `tpu` (Cloud TPU VM libtpu)
# and `cpu` (JAX CPU backend — the PoCL analog used to run the test suite
# anywhere).

FROM python:3.12-slim AS build
WORKDIR /src
COPY pyproject.toml README.md ./
COPY collision_tpu ./collision_tpu
RUN python -m venv /venv && /venv/bin/pip install --upgrade pip && \
    /venv/bin/pip install .

FROM python:3.12-slim AS cpu
COPY --from=build /venv /venv
ENV PATH=/venv/bin:$PATH JAX_PLATFORMS=cpu
COPY tests /opt/collision-tpu/tests
WORKDIR /opt/collision-tpu
RUN pip install pytest || /venv/bin/pip install pytest
CMD ["python", "-m", "pytest", "tests", "-q"]

FROM python:3.12-slim AS tpu
COPY --from=build /venv /venv
ENV PATH=/venv/bin:$PATH
RUN /venv/bin/pip install "jax[tpu]" \
    -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
COPY bench.py /opt/collision-tpu/bench.py
WORKDIR /opt/collision-tpu
CMD ["python", "bench.py"]
