# Tests run on a virtual 8-device CPU mesh with float64 enabled so that
# numerics match the reference's f64 accumulation; TPU runs are exercised by
# bench.py / __graft_entry__.py on real hardware. Note: this JAX build does
# not honor JAX_PLATFORMS/JAX_ENABLE_X64 env vars — use the config API.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF = "/root/reference"
HAPMAP_GDS = f"{REF}/inst/extdata/hapmap_geno.gds"
VALID = f"{REF}/inst/unitTests/valid"


@pytest.fixture(scope="session")
def hapmap():
    from snprelate_tpu.io.store import open_snp_gds
    return open_snp_gds(HAPMAP_GDS)


@pytest.fixture(scope="session")
def golden():
    """Golden values from the reference test suite (inst/unitTests/valid)."""
    from snprelate_tpu.io.rdata import parse_rdata

    def unwrap(x):
        return x.value if hasattr(x, "value") else x

    out = {}
    for name, var in [("IBS", "ibs"), ("PCA", ".rv"), ("MoM", "ibd"),
                      ("KING", ".king"), ("Beta", ".beta"),
                      ("EIGMIX", ".eigmix")]:
        d = parse_rdata(f"{VALID}/Validate.{name}.RData")
        v = unwrap(d[var])
        if isinstance(v, list):
            v = [unwrap(x) for x in v]
        out[name] = v
    return out
