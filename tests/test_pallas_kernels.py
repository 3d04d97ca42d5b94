"""Pallas shuffle kernels in interpret mode: full settings matrix vs the oracle.

This is the CPU stand-in for the TPU parity suite (``scripts/tpu_parity.py``): the
same kernel trace runs through the Pallas interpreter, so plain pytest catches
logic regressions in ``ops/pallas/shuffle.py`` without a chip.
"""

import pytest

from dxt_lossless_transform_tpu.settings import (
    Bc1TransformSettings, Bc2TransformSettings, Bc3TransformSettings,
    Bc4TransformSettings, Bc5TransformSettings,
)
from dxt_lossless_transform_tpu.utils import parity


@pytest.mark.parametrize("settings", list(Bc1TransformSettings.all_combinations()),
                         ids=str)
def test_bc1_kernel_interpret(settings):
    parity.check_bc1(settings, n_blocks=2048, interpret=True)


@pytest.mark.parametrize("settings", list(Bc2TransformSettings.all_combinations()),
                         ids=str)
def test_bc2_kernel_interpret(settings):
    parity.check_bc2(settings, n_blocks=1024, interpret=True)


@pytest.mark.parametrize("settings", list(Bc3TransformSettings.all_combinations()),
                         ids=str)
def test_bc3_kernel_interpret(settings):
    parity.check_bc3(settings, n_blocks=1024, interpret=True)


@pytest.mark.parametrize("settings", list(Bc4TransformSettings.all_combinations()),
                         ids=str)
def test_bc4_kernel_interpret(settings):
    parity.check_bc4(settings, n_blocks=2048, interpret=True)


@pytest.mark.parametrize("settings", list(Bc5TransformSettings.all_combinations()),
                         ids=str)
def test_bc5_kernel_interpret(settings):
    parity.check_bc5(settings, n_blocks=1024, interpret=True)
