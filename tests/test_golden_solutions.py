"""Golden full-solution regressions on the 46×46 non-SPD graph
(test/runtests.jl:143-225) — exact iterate/CG vectors pinned by the
reference (PyAMG-equivalent outputs)."""

import numpy as np

import algebraicmultigrid_tpu as amg

GOLDEN_SOLVE_1CYCLE = np.array([
    0.76347046, -0.5498286, -0.2705487, -0.15047352, -0.10248021,
    0.60292674, -0.11497073, -0.08460548, -0.06931461, 0.38230708,
    -0.055664, -0.04854558, -0.04577031, 0.09964325, 0.01825624,
    -0.01990265, -0.02866185, -0.03049521, 0.03310897, -0.01709034,
    -0.02038031, -0.01325201, -0.01051535, 0.02992818, 0.01493605,
    -0.00633922, -0.01285614, -0.01155069, -0.01095907, 0.04415807,
    0.02213755, 0.018686, 0.02625713, 0.02007781, 0.01898018,
    0.02107552, 0.01909623, 0.01874986, 0.01852736, 0.01844719,
    0.01841821, 0.01841695, 0.01953195, 0.01885713, 0.01864432,
    0.0185079,
])

GOLDEN_CG = np.array([
    0.82365077, -0.537589, -0.30632349, -0.19370186, -0.14773294,
    0.68489145, -0.15550115, -0.1278148, -0.11197922, 0.45362483,
    -0.08577219, -0.08598307, -0.08477946, 0.12985118, 0.02805496,
    -0.03907565, -0.05950957, -0.06544269, 0.05446686, -0.047537,
    -0.05203899, -0.04685981, -0.04491762, 0.05639249, 0.02792704,
    -0.02282528, -0.04062864, -0.04321821, -0.0441893, 0.07593055,
    0.05212038, 0.04464215, 0.05835841, 0.05079815, 0.04830733,
    0.05272397, 0.05028666, 0.0494817, 0.04960952, 0.0496615,
    0.04968258, 0.04968737, 0.05105749, 0.05009268, 0.04972329,
    0.04970173,
])

GOLDEN_SYMGS_1CYCLE = np.array([
    0.775725, -0.571202, -0.290989, -0.157001, -0.106981, 0.622652,
    -0.122318, -0.0891874, -0.0709834, 0.392621, -0.055544, -0.0507485,
    -0.0466376, 0.107175, 0.0267468, -0.0200843, -0.0282827, -0.0299929,
    0.0420468, -0.0175585, -0.0181318, -0.0121591, -0.00902523, 0.0394795,
    0.019981, -0.00270916, -0.0106855, -0.0093661, -0.00837619, 0.052532,
    0.0301423, 0.0248904, 0.0333098, 0.0262179, 0.0246211, 0.026778,
    0.0245746, 0.0238448, 0.0233892, 0.0231593, 0.0230526, 0.0229771,
    0.0247913, 0.0238555, 0.0233681, 0.023096,
])


def _b(n):
    b = np.zeros(n)
    b[0], b[1] = 1, -1
    return b


def test_laplacian_rhs_zero_iterate(thing):
    # b = A·1 = 0 for this graph: one cycle from zero stays ≈ 0
    n = thing.shape[0]
    smoother = amg.GaussSeidel(amg.ForwardSweep())
    ml = amg.ruge_stuben(
        thing, presmoother=smoother, postsmoother=smoother, coarse_solver=amg.Pinv
    )
    x = amg.solve_mg(ml, thing @ np.ones(n), maxiter=1, abstol=1e-12)
    assert np.sum(x**2) < 1e-8


def test_one_cycle_golden_forward_gs(thing):
    n = thing.shape[0]
    smoother = amg.GaussSeidel(amg.ForwardSweep())
    x = amg.solve(
        thing, _b(n), amg.RugeStubenAMG(),
        presmoother=smoother, postsmoother=smoother,
        maxiter=1, abstol=1e-12, coarse_solver=amg.Pinv,
    )
    assert np.sum((x - GOLDEN_SOLVE_1CYCLE) ** 2) < 1e-8


def test_cg_golden(thing):
    n = thing.shape[0]
    smoother = amg.GaussSeidel(amg.ForwardSweep())
    ml = amg.ruge_stuben(
        thing, presmoother=smoother, postsmoother=smoother, coarse_solver=amg.Pinv
    )
    p = amg.aspreconditioner(ml)
    x = amg.cg(thing, _b(n), M=p, tol=np.sqrt(np.finfo(np.float64).eps))
    assert np.sum((x - GOLDEN_CG) ** 2) < 1e-8


def test_one_cycle_golden_symmetric_gs(thing):
    n = thing.shape[0]
    ml = amg.ruge_stuben(thing, coarse_solver=amg.Pinv)
    x = amg.solve_mg(ml, _b(n), maxiter=1, reltol=1e-12)
    assert np.sum((x - GOLDEN_SYMGS_1CYCLE) ** 2) < 1e-8


def test_device_engine_reproduces_golden(thing):
    # same goldens through the jitted device engine (scan-GS conformance path)
    n = thing.shape[0]
    ml = amg.ruge_stuben(thing, coarse_solver=amg.Pinv)
    x = ml.solve(_b(n), engine="jax", maxiter=1, reltol=1e-12, log=True)[0]
    assert np.sum((x - GOLDEN_SYMGS_1CYCLE) ** 2) < 1e-8
