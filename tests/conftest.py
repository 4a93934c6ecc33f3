import jax
import pytest


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, "tests expect the faked 8-device CPU platform (see root conftest)"
    return devs
