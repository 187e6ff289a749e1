"""Reference import-path drop-in compatibility (``import gpcsd_tpu as gpcsd``)."""

import numpy as np


def test_all_reference_import_paths():
    from gpcsd_tpu.gpcsd1d import GPCSD1D  # noqa: F401
    from gpcsd_tpu.gpcsd2d import GPCSD2D  # noqa: F401
    from gpcsd_tpu.covariances import (  # noqa: F401
        GPCSD1DSpatialCovSE,
        GPCSD2DSpatialCovSE,
        GPCSDTemporalCovMatern,
        GPCSDTemporalCovSE,
    )
    from gpcsd_tpu.priors import (  # noqa: F401
        GPCSDHalfNormalPrior,
        GPCSDInvGammaPrior,
        GPCSDPrior,
    )
    from gpcsd_tpu.forward_models import b_fwd_1d, fwd_model_1d  # noqa: F401
    from gpcsd_tpu.predict_csd import predictcsd_trad_1d  # noqa: F401
    from gpcsd_tpu.utility_functions import (  # noqa: F401
        comp_eig_D,
        expand_grid,
        mykron,
        normalize,
        reduce_grid,
        sort_grid,
    )


def test_comp_eig_D_flat_convention(rng):
    """Returns (Qs, Qt, flat Dvec) exactly as the reference
    (utility_functions.py:44-64)."""
    from gpcsd_tpu.utility_functions import comp_eig_D, mykron

    A = rng.normal(size=(4, 4))
    Ks = A @ A.T + 4 * np.eye(4)
    B = rng.normal(size=(6, 6))
    Kt = B @ B.T + 6 * np.eye(6)
    Qs, Qt, Dvec = comp_eig_D(Ks, Kt, 0.2)
    assert np.asarray(Dvec).shape == (24,)
    got = np.asarray(mykron(Qs, Qt)) @ np.diag(np.asarray(Dvec)) @ np.asarray(mykron(Qs, Qt)).T
    want = np.kron(Ks, Kt) + 0.2 * np.eye(24)
    assert np.allclose(got, want, atol=1e-8)
