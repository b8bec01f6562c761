"""Physics core correctness.

Three independent cross-checks of physics/dynamics.py's closed-form solver:
  1. against a mechanically autodiff-derived Lagrangian solver (no shared
     algebra) on random states and random generalized forces;
  2. against the classic textbook planar cart-pole equations in the planar
     limit (uy = 0, motion restricted to the x axis);
  3. energy conservation under semi-implicit Euler with no dissipation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cartpoleplusplus_tpu.physics import (
    CartPoleParams,
    PhysState,
    apply_push_impulse,
    rest_state,
    solve_accel,
    substep,
    total_energy,
)
from cartpoleplusplus_tpu.physics.lagrangian import solve_accel_autodiff

P = CartPoleParams()


def random_state(key, max_tilt=0.8):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    s = jax.random.uniform(k1, (2,), minval=-0.6, maxval=0.6)
    s = s * jnp.minimum(1.0, max_tilt / jnp.linalg.norm(s))
    sd = jax.random.uniform(k2, (2,), minval=-2.0, maxval=2.0)
    q = jnp.concatenate([jax.random.uniform(k3, (3,), minval=-1.0, maxval=1.0), s])
    qd = jnp.concatenate([jax.random.uniform(k4, (3,), minval=-2.0, maxval=2.0), sd])
    return q, qd


@pytest.mark.slow  # deep physics cross-check; oracle/golden parity stays fast
@pytest.mark.parametrize("seed", range(8))
def test_closed_form_matches_autodiff_lagrangian(seed):
    key = jax.random.PRNGKey(seed)
    kq, kf = jax.random.split(key)
    q, qd = random_state(kq)
    gen_force = jax.random.uniform(kf, (5,), minval=-5.0, maxval=5.0)
    qdd_auto = solve_accel_autodiff(P, q, qd, gen_force)
    qdd_closed = jnp.stack(
        solve_accel(P, q[3], q[4], qd[3], qd[4],
                    gen_force[0], gen_force[1], gen_force[2],
                    gen_force[3], gen_force[4]))
    np.testing.assert_allclose(np.asarray(qdd_closed), np.asarray(qdd_auto),
                               rtol=2e-4, atol=2e-4)


def test_planar_limit_matches_textbook():
    """uy = sdy = 0, force along x: compare with the classic 2D cart-pole.

    Textbook (pole hinged on cart, theta from vertical, ux = sin(theta)):
      (M+m) xdd + m l (thdd cos th - thd^2 sin th) = F
      (I + m l^2) thdd + m l xdd cos th - m g l sin th = 0
    """
    th, thd, f = 0.23, -0.7, 3.1
    mt, m, l, g = P.total_mass, P.pole_mass, P.half_length, P.gravity
    kg = P.pole_gen_inertia
    # Solve the textbook 2x2 system.
    a = np.array([[mt, m * l * np.cos(th)], [m * l * np.cos(th), kg]])
    b = np.array([f + m * l * thd**2 * np.sin(th), m * g * l * np.sin(th)])
    xdd_ref, thdd_ref = np.linalg.solve(a, b)

    sx = np.sin(th)
    sdx = thd * np.cos(th)

    def accels(qz):
        return solve_accel(
            P, jnp.float32(sx), jnp.float32(0.0), jnp.float32(sdx),
            jnp.float32(0.0), jnp.float32(f), jnp.float32(0.0),
            jnp.float32(qz), jnp.float32(0.0), jnp.float32(0.0))

    # The textbook cart rides a track: the ground supplies whatever normal
    # force holds zdd = 0. az is affine in Q_z; solve for the root.
    az0 = float(accels(0.0)[2])
    az1 = float(accels(1.0)[2])
    qz_star = -az0 / (az1 - az0)
    ax, ay, az, asx, asy = accels(qz_star)
    assert abs(float(az)) < 1e-4  # f32 residual of the affine root-solve
    # Convert s-acceleration to theta-acceleration:
    # ux = sin th -> uxdd = thdd cos th - thd^2 sin th
    thdd_closed = (np.asarray(asx) + thd**2 * np.sin(th)) / np.cos(th)
    np.testing.assert_allclose(np.asarray(ax), xdd_ref, rtol=1e-4)
    np.testing.assert_allclose(thdd_closed, thdd_ref, rtol=1e-4)
    assert abs(np.asarray(ay)) < 1e-6 and abs(np.asarray(asy)) < 1e-6


def test_energy_conservation_free_swing():
    """No actuation, no damping, cart in the air (no contact): E drifts
    only at the integrator's bounded semi-implicit rate."""
    p = P.replace(contact_stiffness=0.0, contact_damping=0.0)
    st = PhysState(
        pos=jnp.array([0.0, 0.0, 5.0]),
        vel=jnp.array([0.1, -0.2, 0.0]),
        s=jnp.array([0.3, -0.2]),
        sd=jnp.array([0.5, 0.4]),
    )
    zero2 = jnp.zeros(2)

    def body(st, _):
        st = substep(p, st, zero2, zero2)
        return st, total_energy(p, st)

    e0 = total_energy(p, st)
    _, es = jax.lax.scan(body, st, None, length=500)
    drift = jnp.max(jnp.abs(es - e0)) / jnp.abs(e0)
    assert float(drift) < 0.02, float(drift)


def test_contact_holds_cart_at_rest():
    """Resting equilibrium: state is stationary under the contact penalty."""
    st = rest_state(P)
    zero2 = jnp.zeros(2)
    for _ in range(100):
        st = substep(P, st, zero2, zero2)
    np.testing.assert_allclose(float(st.pos[2]),
                               P.cart_rest_z - P.rest_penetration, atol=1e-4)
    assert float(jnp.abs(st.vel).max()) < 1e-4
    assert float(jnp.abs(st.s).max()) < 1e-6


@pytest.mark.slow
def test_contact_resolves_drop():
    """Drop the cart from above the plane: it lands and settles near rest
    height (genuine contact resolution, not a hard-coded constraint)."""
    st = rest_state(P)
    st = st._replace(pos=st.pos.at[2].set(0.3))
    zero2 = jnp.zeros(2)
    for _ in range(2000):
        st = substep(P, st, zero2, zero2)
    np.testing.assert_allclose(float(st.pos[2]),
                               P.cart_rest_z - P.rest_penetration, atol=2e-3)
    assert abs(float(st.vel[2])) < 1e-2


def test_push_impulse_momentum():
    """Generalized impulse: applying F*tau via apply_push_impulse equals
    integrating the same constant force over tau with tiny substeps."""
    tau = P.initial_push_duration
    push = jnp.array([0.9, -0.4])
    st0 = rest_state(P)
    st_imp = apply_push_impulse(P, st0, push, tau)

    n = 400
    p_fine = P.replace(dt=tau / n)
    st_int = st0
    zero2 = jnp.zeros(2)
    for _ in range(n):
        st_int = substep(p_fine, st_int, zero2, push)
    np.testing.assert_allclose(np.asarray(st_imp.vel[:2]),
                               np.asarray(st_int.vel[:2]), atol=5e-4)
    np.testing.assert_allclose(np.asarray(st_imp.sd),
                               np.asarray(st_int.sd), atol=5e-4)


def test_batched_matches_single():
    """The same math must hold elementwise on batched arrays."""
    key = jax.random.PRNGKey(0)
    b = 16
    ks = jax.random.split(key, b)
    qs, qds = jax.vmap(random_state)(ks)
    st = PhysState(pos=qs[:, :3], vel=qds[:, :3], s=qs[:, 3:], sd=qds[:, 3:])
    f = jax.random.uniform(key, (b, 2), minval=-3, maxval=3)
    out_b = substep(P, st, f, jnp.zeros((b, 2)))
    for i in range(b):
        sti = jax.tree.map(lambda a: a[i], st)
        out_i = substep(P, sti, f[i], jnp.zeros(2))
        for leaf_b, leaf_i in zip(jax.tree.leaves(out_b), jax.tree.leaves(out_i)):
            np.testing.assert_allclose(np.asarray(leaf_b[i]), np.asarray(leaf_i),
                                       rtol=1e-6, atol=1e-6)
