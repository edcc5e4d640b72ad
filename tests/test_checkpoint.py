"""Posterior checkpoint / resume (new capability over the reference,
SURVEY.md section 5.4)."""
import os

import numpy as np
import pandas as pd
import pytest
import scipy.stats

from odelib_tpu import ModelFramework, parameter
from odelib_tpu.utils import checkpoint as ckpt

from helpers import synthetic_df, zero_i


@pytest.fixture()
def model():
    return ModelFramework(ODE=zero_i, parameter_names=["mu", "phi", "beta"],
                          state_names=["S", "V"], dataframe=synthetic_df(),
                          t_steps=60,
                          mu=parameter(scipy.stats.lognorm,
                                       {"s": 3, "scale": 1e-8}),
                          phi=parameter(scipy.stats.lognorm,
                                        {"s": 3, "scale": 1e-8}),
                          beta=parameter(scipy.stats.lognorm,
                                         {"s": 1, "scale": 25}))


def test_save_load_roundtrip(tmp_path):
    df = pd.DataFrame({"mu": [0.1, 0.2], "chi": [1.0, 2.0],
                       "chain#": [0, 1]})
    p = str(tmp_path / "post.npz")
    ckpt.save_posterior(p, df)
    back = ckpt.load_posterior(p)
    pd.testing.assert_frame_equal(back, df, check_dtype=False)


def test_mcmc_checkpoint_and_resume(model, tmp_path):
    inits = pd.DataFrame([dict(mu=0.6, phi=2.4e-8, beta=24.0)] * 2)
    p = str(tmp_path / "post.npz")
    post = model.MCMC(chain_inits=inits, iterations_per_chain=40,
                      print_report=False, checkpoint_path=p)
    back = ckpt.load_posterior(p)
    assert len(back) == len(post)
    np.testing.assert_allclose(back["chi"], post["chi"])

    # resume: continue both chains from their last recorded state
    resume = ckpt.resume_theta(back, ["mu", "phi", "beta"], 2)
    assert len(resume) == 2
    post2 = model.MCMC(chain_inits=resume, iterations_per_chain=40,
                       print_report=False)
    assert len(post2) == len(post)


def test_save_honors_exact_path(tmp_path):
    """np.savez appends .npz to foreign extensions; save_posterior must not
    (the save->load round trip uses the user's exact path)."""
    import pandas as pd

    from odelib_tpu.utils import load_posterior, save_posterior

    p = str(tmp_path / "post.parquet")  # deliberately non-npz extension
    df = pd.DataFrame({"mu": [1.0, 2.0], "chain#": [0, 0]})
    save_posterior(p, df)
    assert os.path.exists(p) and not os.path.exists(p + ".npz")
    pd.testing.assert_frame_equal(load_posterior(p), df)
