"""Config-system tests: prm parsing, expression compilation, schema mapping,
and the reference's cross-field validation (src/parameters.cc:536-550).
Reads the REAL reference example configs to prove they parse unchanged."""

import glob

import jax.numpy as jnp
import numpy as np
import pytest

from dflo_tpu.config.expressions import compile_expression, compile_vector_expression
from dflo_tpu.config.params import AllParameters
from dflo_tpu.config.prm import parse_prm
from dflo_tpu.physics import euler

SOD_PRM = """
set degree = 2
set basis = Pk
set mapping = cartesian
subsection boundary_0
   set type = slip
end
subsection boundary_2
   set type = inflow
   set w_2 value = 1.0
   set w_3 value = 2.5
end
subsection initial condition
   set w_2 value = 1.0*(x<=0.5) + 0.125*(x>0.5)
   set w_3 value = 2.5*(x<=0.5) + 0.250*(x>0.5)
end
subsection time stepping
  set cfl = 0.9
  set final time = 0.2
end
subsection limiter
   set type = TVB
   set characteristic limiter = true
   set beta = 2.0
end
subsection flux
 set flux = hllc
end
subsection refinement
  set refinement = false
end
"""


def test_parse_prm_basics():
    d = parse_prm(SOD_PRM)
    assert d["degree"] == "2"
    assert d["boundary_0"]["type"] == "slip"
    assert d["initial condition"]["w_2 value"] == "1.0*(x<=0.5) + 0.125*(x>0.5)"


def test_parse_prm_errors():
    with pytest.raises(ValueError):
        parse_prm("subsection a\n")       # missing end
    with pytest.raises(ValueError):
        parse_prm("end\n")                # unmatched end
    with pytest.raises(ValueError):
        parse_prm("sit key = 1\n")        # malformed line


def test_expression_sod_profile():
    f = compile_expression("1.0*(x<=0.5) + 0.125*(x>0.5)")
    x = jnp.array([0.25, 0.75])
    out = np.array(f(x, x * 0, 0.0))
    np.testing.assert_allclose(out, [1.0, 0.125])


def test_expression_functions_and_power():
    f = compile_expression("sqrt(x*x+y*y) + sin(pi*t)^2")
    out = float(f(jnp.array(3.0), jnp.array(4.0), jnp.array(0.5)))
    assert abs(out - 6.0) < 1e-12


def test_expression_if_and_constants():
    f = compile_expression("if(x>0, exp(0.0), 2*pi)")
    assert float(f(jnp.array(1.0), 0.0, 0.0)) == 1.0
    assert abs(float(f(jnp.array(-1.0), 0.0, 0.0)) - 2 * np.pi) < 1e-12


def test_expression_rejects_unsafe():
    for bad in ("__import__('os')", "x.__class__", "lambda: 1", "open(1)",
                "foo(3)", "zz + 1"):
        with pytest.raises(ValueError):
            compile_expression(bad)


def test_expression_is_traceable():
    import jax
    f = compile_expression("1.0*(x<=0.5) + 0.125*(x>0.5)")
    g = jax.jit(lambda x: f(x, x, 0.0))
    np.testing.assert_allclose(np.array(g(jnp.array([0.0, 1.0]))), [1.0, 0.125])


def test_all_parameters_from_sod():
    p = AllParameters.from_dict(parse_prm(SOD_PRM))
    assert p.degree == 2 and p.basis == "Pk"
    assert p.flux.flux == "hllc"
    assert p.limiter.type == "TVB" and p.limiter.char_lim
    assert p.boundary_conditions[0].kind == euler.BC_SLIP
    assert p.boundary_conditions[2].kind == euler.BC_INFLOW
    ic = p.initial_conditions(jnp.array([0.25, 0.75]), jnp.zeros(2), 0.0)
    np.testing.assert_allclose(np.array(ic[euler.RHO]), [1.0, 0.125])


def test_validation_rules():
    # MOOD requires Pk (src/parameters.cc:536-544)
    with pytest.raises(ValueError, match="MOOD"):
        AllParameters.from_dict(parse_prm(
            "set basis = Qk\nset mapping = cartesian\n"
            "subsection time stepping\n set cfl = 0.5\nend\n"
            "subsection linear solver\n set method = mood\nend\n"))
    # TVB requires cartesian mapping (src/parameters.cc:545-546)
    with pytest.raises(ValueError, match="TVB"):
        AllParameters.from_dict(parse_prm(
            "set mapping = q1\n"
            "subsection time stepping\n set cfl = 0.5\nend\n"
            "subsection limiter\n set type = TVB\nend\n"))
    # unknown keys rejected
    with pytest.raises(ValueError, match="unknown"):
        AllParameters.from_dict(parse_prm(
            "set bogus = 1\nsubsection time stepping\n set cfl = 0.5\nend\n"))


def test_reference_example_configs_parse():
    """Every .prm in the reference's examples/ parses; the serial-tree ones
    also map onto AllParameters."""
    paths = sorted(glob.glob("/root/reference/examples/**/*.prm",
                             recursive=True))
    assert len(paths) > 15
    parsed = 0
    for path in paths:
        with open(path) as f:
            d = parse_prm(f.read())
        assert d
        try:
            AllParameters.from_dict(d)
            parsed += 1
        except ValueError:
            pass  # gll/mpi-tree extras (potential forms etc.) handled as added
    # the big majority must map cleanly
    assert parsed >= len(paths) * 2 // 3, (parsed, len(paths))
