"""ironcub_mpc_tpu — TPU-native unified multi-rate MPC framework for the
iRonCub jet-powered humanoid.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
``ami-iit/paper_gorbani_2025_humanoids_multi-rate-mpc-ironcub`` (the companion
code of "Unified Multi-Rate Model Predictive Control for a Jet-Powered
Humanoid Robot", Humanoids 2025):

- ``core``      typed state layout + configuration tree (parameter names match
                the reference's ``vs_mcp_config.xml`` / ``robot.toml``).
- ``ops``       compute primitives: polynomial jet model, SO(3)/RPY algebra,
                batched OSQP-style ADMM QP solver (pure JAX + Pallas kernels).
- ``dynamics``  fixed-topology floating-base kinodynamics in JAX (the
                iDynTree-equivalent layer: FK, Jacobians, CRBA mass matrix,
                centroidal momentum, jet allocation / coupling matrices).
- ``horizon``   variable-sampling-time horizon: quadratic time warp, dt
                schedule and input-blocking maps as trace-time constants.
- ``qp``        block-structured MPC problem assembly + the multi-rate MPC
                pipeline as pure functions over an explicit carry.
- ``sim``       JAX plant: rigid-body dynamics, LSTM jet model, batched EKF.
- ``runtime``   closed-loop driver, trajectory manager, telemetry.
- ``parallel``  device-mesh scenario sharding, multi-host Monte Carlo.
"""

__version__ = "0.1.0"

# This is a control framework, not a neural net: mass matrices with 1e4
# condition numbers, KKT systems and Jacobian chains cannot tolerate TPU's
# default bf16-grade f32 matmul passes (observed failure: the plant's
# M + dt·D solve goes indefinite mid-flight and the state explodes within
# one substep). Full-precision f32 matmuls everywhere by default; kernels
# that can tolerate less opt down explicitly.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")
