// Host-side batched MPE simple_tag physics engine.
//
// The reference steps MPE on the host through PettingZoo's per-agent numpy
// loops (torch_ver/src/env.py:24-39 creates the env; torch_ver/main.py:67-76
// is the 128-step hot loop SURVEY §3.1 flags).  PettingZoo is not a
// dependency of this framework; the host path instead gets a first-party
// C++ engine implementing the same published simple_tag dynamics as the
// in-repo JAX env (mfvae_tpu/envs/mpe.py, itself oracle-verified in
// tests/test_env_fidelity.py).  Fidelity of THIS engine is established by
// state-injection equivalence against that JAX env (tests/test_native_engine.py).
//
// Design: structure-of-arrays state per environment, batched over n_envs
// with a persistent worker pool (one worker owns a contiguous env range, so
// no false sharing on the per-env state).  All math in float32 to mirror
// the XLA f32 compute of the JAX env.
//
// Observation layout per agent (identical to mpe.py _observe):
//   [self_vel(2), self_pos(2), landmark_rel(2L),
//    other_rel(2(A-1), agent order, self dropped),
//    good_vel(2G for adversaries; 2(G-1) for good agents, self dropped)]
// Per-env output layout: adversaries' obs rows first, then good agents',
// concatenated flat (caller reshapes).

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <limits>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

// Public MPE scenario constants (must match mfvae_tpu/envs/mpe.py).
constexpr float kDt = 0.1f;
constexpr float kDamping = 0.25f;
constexpr float kContactForce = 1e2f;
constexpr float kContactMargin = 1e-3f;
constexpr float kAdvSize = 0.075f, kGoodSize = 0.05f, kLandmarkSize = 0.2f;
constexpr float kAdvAccel = 3.0f, kGoodAccel = 4.0f;
constexpr float kAdvMaxSpeed = 1.0f, kGoodMaxSpeed = 1.3f;
constexpr float kCollisionReward = 10.0f;
// simple_spread: homogeneous agents (size .15, accel 5, no speed clip),
// non-collidable target landmarks (.05)
constexpr float kSpreadAgentSize = 0.15f;
constexpr float kSpreadAccel = 5.0f;
// simple_world_comm: good agents are smaller (.045); food/forests are
// non-collidable; leader broadcasts a dim_c one-hot channel
constexpr float kGoodSizeWc = 0.045f;
constexpr float kFoodSize = 0.03f;
constexpr float kForestSize = 0.3f;
constexpr float kWcCollisionReward = 5.0f;
constexpr float kFoodReward = 2.0f;
constexpr float kBoundaryExitPenalty = 10.0f;

// simple_adversary: homogeneous agents (size .15, accel 5, no speed
// clip), nothing collides; one landmark (.08) is the goal, chosen at reset
constexpr float kAdversaryAccel = 5.0f;

enum Scenario { kTag = 0, kSpread = 1, kWorldComm = 2, kAdversary = 3 };

struct EnvState {
  std::vector<float> pos;   // [A][2]
  std::vector<float> vel;   // [A][2]
  std::vector<float> lmk;   // [L][2]
  std::vector<float> comm;  // [dim_c] leader channel (world_comm only)
  int32_t goal = 0;         // goal landmark index (simple_adversary only)
  int32_t step = 0;
  std::mt19937_64 rng;
};

struct Engine {
  Scenario scenario = kTag;
  int n_envs, n_good, n_adv, n_lmk, max_steps;
  int n_agents;        // n_adv + n_good (adversaries first, like mpe.py)
  int d_adv, d_good;   // per-class obs widths (spread: d_adv unused)
  int d_lead = 0;      // world_comm: leader obs width (leader = agent 0)
  int n_obs_lmk = 0, n_food = 0, n_forests = 0, dim_c = 0;  // world_comm
  int obs_stride;      // floats per env in obs output
  std::vector<EnvState> envs;
  // scratch per env is tiny; workers keep their own
  // --- worker pool ---
  int n_threads;
  std::vector<std::thread> workers;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  uint64_t generation = 0;
  int pending = 0;
  bool shutdown = false;
  // current job
  const int32_t* job_actions = nullptr;
  const float* job_cactions = nullptr;  // continuous [n_envs*A*2], or null
  float* job_obs = nullptr;
  float* job_rew = nullptr;
  uint8_t* job_done = nullptr;
  bool job_step = false;  // false: observe only
  bool job_auto_reset = false;
};

inline float softplus_pen(float dist, float dist_min) {
  // jnp.logaddexp(0, -(dist - dist_min)/k) * k — numerically stable softplus
  const float x = -(dist - dist_min) / kContactMargin;
  const float sp = x > 0.0f ? x + std::log1p(std::exp(-x)) : std::log1p(std::exp(x));
  return sp * kContactMargin;
}

void reset_env(const Engine& e, EnvState& s) {
  std::uniform_real_distribution<float> u_agent(-1.0f, 1.0f);
  std::uniform_real_distribution<float> u_lmk(-0.9f, 0.9f);
  for (int i = 0; i < e.n_agents * 2; ++i) s.pos[i] = u_agent(s.rng);
  std::fill(s.vel.begin(), s.vel.end(), 0.0f);
  for (int i = 0; i < e.n_lmk * 2; ++i) s.lmk[i] = u_lmk(s.rng);
  std::fill(s.comm.begin(), s.comm.end(), 0.0f);
  if (e.scenario == kAdversary) {
    std::uniform_int_distribution<int32_t> u_goal(0, e.n_lmk - 1);
    s.goal = u_goal(s.rng);
  }
  s.step = 0;
}

// simple_tag observation for one env into out[obs_stride] (layout in file
// header).
void observe_tag(const Engine& e, const EnvState& s, float* out) {
  const int A = e.n_agents, L = e.n_lmk, G = e.n_good, ADV = e.n_adv;
  float* o = out;
  for (int i = 0; i < A; ++i) {
    const bool adversary = i < ADV;
    *o++ = s.vel[2 * i];
    *o++ = s.vel[2 * i + 1];
    *o++ = s.pos[2 * i];
    *o++ = s.pos[2 * i + 1];
    for (int l = 0; l < L; ++l) {
      *o++ = s.lmk[2 * l] - s.pos[2 * i];
      *o++ = s.lmk[2 * l + 1] - s.pos[2 * i + 1];
    }
    for (int j = 0; j < A; ++j) {
      if (j == i) continue;
      *o++ = s.pos[2 * j] - s.pos[2 * i];
      *o++ = s.pos[2 * j + 1] - s.pos[2 * i + 1];
    }
    if (adversary) {
      for (int g = 0; g < G; ++g) {
        *o++ = s.vel[2 * (ADV + g)];
        *o++ = s.vel[2 * (ADV + g) + 1];
      }
    } else {
      for (int g = 0; g < G; ++g) {
        if (ADV + g == i) continue;
        *o++ = s.vel[2 * (ADV + g)];
        *o++ = s.vel[2 * (ADV + g) + 1];
      }
    }
  }
}

// simple_spread observation (mpe.py SimpleSpreadEnv._observe):
// [self_vel(2), self_pos(2), landmark_rel(2L), other_rel(2(A-1)),
//  comm zeros(2(A-1))].
void observe_spread(const Engine& e, const EnvState& s, float* out) {
  const int A = e.n_agents, L = e.n_lmk;
  float* o = out;
  for (int i = 0; i < A; ++i) {
    *o++ = s.vel[2 * i];
    *o++ = s.vel[2 * i + 1];
    *o++ = s.pos[2 * i];
    *o++ = s.pos[2 * i + 1];
    for (int l = 0; l < L; ++l) {
      *o++ = s.lmk[2 * l] - s.pos[2 * i];
      *o++ = s.lmk[2 * l + 1] - s.pos[2 * i + 1];
    }
    for (int j = 0; j < A; ++j) {
      if (j == i) continue;
      *o++ = s.pos[2 * j] - s.pos[2 * i];
      *o++ = s.pos[2 * j + 1] - s.pos[2 * i + 1];
    }
    for (int j = 0; j < 2 * (A - 1); ++j) *o++ = 0.0f;  // comm channel
  }
}

// simple_world_comm observation (mpe.py SimpleWorldCommEnv._observe).
// Landmark layout: [obstacles | food | forests].  Visibility: same forest,
// both outside all forests, or observer is the leader (agent 0).
void observe_wc(const Engine& e, const EnvState& s, float* out) {
  const int A = e.n_agents, E = e.n_lmk, ADV = e.n_adv, G = e.n_good;
  const int F = e.n_forests, C = e.dim_c;
  const int forest0 = e.n_obs_lmk + e.n_food;

  static thread_local std::vector<uint8_t> in_f, vis;
  static thread_local std::vector<uint8_t> in_any;
  in_f.assign(A * F, 0);
  in_any.assign(A, 0);
  for (int i = 0; i < A; ++i) {
    const float size_i = i < ADV ? kAdvSize : kGoodSizeWc;
    for (int f = 0; f < F; ++f) {
      const float dx = s.pos[2 * i] - s.lmk[2 * (forest0 + f)];
      const float dy = s.pos[2 * i + 1] - s.lmk[2 * (forest0 + f) + 1];
      if (std::sqrt(dx * dx + dy * dy) < size_i + kForestSize) {
        in_f[i * F + f] = 1;
        in_any[i] = 1;
      }
    }
  }
  vis.assign(A * A, 0);
  for (int i = 0; i < A; ++i) {
    for (int j = 0; j < A; ++j) {
      bool same = false;
      for (int f = 0; f < F; ++f)
        if (in_f[i * F + f] && in_f[j * F + f]) same = true;
      vis[i * A + j] = same || (!in_any[i] && !in_any[j]);
    }
  }
  for (int j = 0; j < A; ++j) vis[0 * A + j] = 1;  // leader sees everyone

  const auto pm = [](bool b) { return b ? 1.0f : -1.0f; };
  float* o = out;
  for (int i = 0; i < A; ++i) {
    *o++ = s.vel[2 * i];
    *o++ = s.vel[2 * i + 1];
    *o++ = s.pos[2 * i];
    *o++ = s.pos[2 * i + 1];
    for (int l = 0; l < E; ++l) {
      *o++ = s.lmk[2 * l] - s.pos[2 * i];
      *o++ = s.lmk[2 * l + 1] - s.pos[2 * i + 1];
    }
    if (i >= ADV) {
      // good agents: own in-forest flags come BEFORE other_rel (mpe.py
      // good-row concat order)
      for (int f = 0; f < F; ++f) *o++ = pm(in_f[i * F + f]);
    }
    for (int j = 0; j < A; ++j) {
      if (j == i) continue;
      const float v = vis[i * A + j] ? 1.0f : 0.0f;
      *o++ = (s.pos[2 * j] - s.pos[2 * i]) * v;
      *o++ = (s.pos[2 * j + 1] - s.pos[2 * i + 1]) * v;
    }
    if (i < ADV) {
      // adversaries (incl leader): visibility-masked good velocities
      for (int g = 0; g < G; ++g) {
        const int j = ADV + g;
        const float v = vis[i * A + j] ? 1.0f : 0.0f;
        *o++ = s.vel[2 * j] * v;
        *o++ = s.vel[2 * j + 1] * v;
      }
      if (i == 0) {
        for (int f = 0; f < F; ++f) {  // per-forest any-prey flag
          bool any_prey = false;
          for (int g = 0; g < G; ++g)
            if (in_f[(ADV + g) * F + f]) any_prey = true;
          *o++ = pm(any_prey);
        }
      } else {
        for (int g = 0; g < G; ++g) *o++ = pm(in_any[ADV + g]);
      }
      for (int c = 0; c < C; ++c) *o++ = s.comm[c];
    } else {
      // good agents: other good agents' visibility-masked velocities
      for (int g = 0; g < G; ++g) {
        const int j = ADV + g;
        if (j == i) continue;
        const float v = vis[i * A + j] ? 1.0f : 0.0f;
        *o++ = s.vel[2 * j] * v;
        *o++ = s.vel[2 * j + 1] * v;
      }
    }
  }
}

// simple_adversary observation (mpe.py SimpleAdversaryEnv._observe):
// adversary (agent 0): [landmark_rel(2L), other_rel(2(A-1))];
// good i: [goal_rel(2), landmark_rel(2L), other_rel(2(A-1))].
void observe_adversary(const Engine& e, const EnvState& s, float* out) {
  const int A = e.n_agents, L = e.n_lmk;
  const float gx = s.lmk[2 * s.goal], gy = s.lmk[2 * s.goal + 1];
  float* o = out;
  for (int i = 0; i < A; ++i) {
    if (i > 0) {  // good agents know the goal
      *o++ = gx - s.pos[2 * i];
      *o++ = gy - s.pos[2 * i + 1];
    }
    for (int l = 0; l < L; ++l) {
      *o++ = s.lmk[2 * l] - s.pos[2 * i];
      *o++ = s.lmk[2 * l + 1] - s.pos[2 * i + 1];
    }
    for (int j = 0; j < A; ++j) {
      if (j == i) continue;
      *o++ = s.pos[2 * j] - s.pos[2 * i];
      *o++ = s.pos[2 * j + 1] - s.pos[2 * i + 1];
    }
  }
}

void observe_env(const Engine& e, const EnvState& s, float* out) {
  if (e.scenario == kSpread)
    observe_spread(e, s, out);
  else if (e.scenario == kWorldComm)
    observe_wc(e, s, out);
  else if (e.scenario == kAdversary)
    observe_adversary(e, s, out);
  else
    observe_tag(e, s, out);
}

// Shared MPE integrator (all scenarios): discrete direction force
// (movement = a % 5, per the published splitter — identity for actions in
// [0, 5)), soft-penetration contact among agents + the first
// n_lmk_collidable landmarks, vel = vel*(1-damping) + F*dt, optional
// per-class speed clip, pos += vel*dt.  Forces come from the OLD state
// (mpe.py step_stacked); the step counter advances here.
void apply_movement(const Engine& e, EnvState& s, const int32_t* actions,
                    const float* cactions, float size_adv, float size_good,
                    float accel_adv, float accel_good, int n_lmk_collidable,
                    bool clip_speed) {
  const int A = e.n_agents, ADV = e.n_adv;
  const int N = A + n_lmk_collidable;
  static const float dirs[5][2] = {
      {0.f, 0.f}, {-1.f, 0.f}, {1.f, 0.f}, {0.f, -1.f}, {0.f, 1.f}};
  static thread_local std::vector<float> force;
  force.assign(A * 2, 0.0f);
  for (int i = 0; i < A; ++i) {
    const float accel = i < ADV ? accel_adv : accel_good;
    if (cactions != nullptr) {  // continuous: the action IS the force dir
      force[2 * i] = cactions[2 * i] * accel;
      force[2 * i + 1] = cactions[2 * i + 1] * accel;
    } else {
      const int32_t m = actions[i] % 5;
      force[2 * i] = dirs[m][0] * accel;
      force[2 * i + 1] = dirs[m][1] * accel;
    }
  }
  auto ent_pos = [&](int k, int c) -> float {
    return k < A ? s.pos[2 * k + c] : s.lmk[2 * (k - A) + c];
  };
  auto ent_size = [&](int k) -> float {
    if (k < ADV) return size_adv;
    if (k < A) return size_good;
    return kLandmarkSize;
  };
  for (int i = 0; i < A; ++i) {
    float fx = 0.0f, fy = 0.0f;
    for (int j = 0; j < N; ++j) {
      if (j == i) continue;
      const float dx = ent_pos(i, 0) - ent_pos(j, 0);
      const float dy = ent_pos(i, 1) - ent_pos(j, 1);
      const float dist = std::sqrt(dx * dx + dy * dy + 1e-12f);
      const float mag =
          kContactForce * softplus_pen(dist, ent_size(i) + ent_size(j)) / dist;
      fx += dx * mag;
      fy += dy * mag;
    }
    force[2 * i] += fx;
    force[2 * i + 1] += fy;
  }
  for (int i = 0; i < A; ++i) {
    float vx = s.vel[2 * i] * (1.0f - kDamping) + force[2 * i] * kDt;
    float vy = s.vel[2 * i + 1] * (1.0f - kDamping) + force[2 * i + 1] * kDt;
    if (clip_speed) {
      const float max_speed = i < ADV ? kAdvMaxSpeed : kGoodMaxSpeed;
      const float speed = std::sqrt(vx * vx + vy * vy);
      const float scale =
          speed > 1e-8f ? std::min(1.0f, max_speed / speed)
                        : std::min(1.0f, max_speed / 1e-8f);
      vx *= scale;
      vy *= scale;
    }
    s.vel[2 * i] = vx;
    s.vel[2 * i + 1] = vy;
    s.pos[2 * i] += vx * kDt;
    s.pos[2 * i + 1] += vy * kDt;
  }
  s.step += 1;
}

// simple_spread step (mpe.py SimpleSpreadEnv.step_stacked): agent-agent
// contact only, accel 5, NO speed clip; shared coverage reward minus
// per-agent collision count.
void step_spread(const Engine& e, EnvState& s, const int32_t* actions,
                 const float* cactions, float* rew, uint8_t* done,
                 bool auto_reset, float* obs_out) {
  const int A = e.n_agents, L = e.n_lmk;
  const float dmin = 2.0f * kSpreadAgentSize;
  apply_movement(e, s, actions, cactions, kSpreadAgentSize, kSpreadAgentSize,
                 kSpreadAccel, kSpreadAccel, /*n_lmk_collidable=*/0,
                 /*clip_speed=*/false);

  // shared coverage reward from the NEW state
  float coverage = 0.0f;
  for (int l = 0; l < L; ++l) {
    float best = std::numeric_limits<float>::infinity();
    for (int i = 0; i < A; ++i) {
      const float dx = s.lmk[2 * l] - s.pos[2 * i];
      const float dy = s.lmk[2 * l + 1] - s.pos[2 * i + 1];
      best = std::min(best, std::sqrt(dx * dx + dy * dy));
    }
    coverage -= best;
  }
  for (int i = 0; i < A; ++i) {
    float coll = 0.0f;
    for (int j = 0; j < A; ++j) {
      if (j == i) continue;
      const float dx = s.pos[2 * i] - s.pos[2 * j];
      const float dy = s.pos[2 * i + 1] - s.pos[2 * j + 1];
      if (std::sqrt(dx * dx + dy * dy) < dmin) coll += 1.0f;
    }
    rew[i] = coverage - coll;
  }

  const bool episode_done = s.step >= e.max_steps;
  *done = episode_done ? 1 : 0;
  if (episode_done && auto_reset) reset_env(e, s);
  if (obs_out != nullptr) observe_env(e, s, obs_out);
}

void step_tag(const Engine& e, EnvState& s, const int32_t* actions,
              const float* cactions, float* rew, uint8_t* done,
              bool auto_reset, float* obs_out) {
  const int ADV = e.n_adv, G = e.n_good;
  // all landmarks collidable in simple_tag
  apply_movement(e, s, actions, cactions, kAdvSize, kGoodSize, kAdvAccel,
                 kGoodAccel, e.n_lmk, /*clip_speed=*/true);

  // rewards from the NEW state (mpe.py _rewards): team collision totals +
  // boundary penalty on good agents
  float total_coll = 0.0f;
  static thread_local std::vector<float> touch;  // per-good adversary touches
  touch.assign(G, 0.0f);
  const float coll_dist = kAdvSize + kGoodSize;
  for (int i = 0; i < ADV; ++i) {
    for (int g = 0; g < G; ++g) {
      const float dx = s.pos[2 * i] - s.pos[2 * (ADV + g)];
      const float dy = s.pos[2 * i + 1] - s.pos[2 * (ADV + g) + 1];
      if (std::sqrt(dx * dx + dy * dy) < coll_dist) {
        total_coll += 1.0f;
        touch[g] += 1.0f;
      }
    }
  }
  for (int i = 0; i < ADV; ++i) rew[i] = kCollisionReward * total_coll;
  for (int g = 0; g < G; ++g) {
    float r = -kCollisionReward * touch[g];
    for (int c = 0; c < 2; ++c) {
      const float x = std::fabs(s.pos[2 * (ADV + g) + c]);
      float bound = 0.0f;
      if (x >= 1.0f)
        bound = std::min(std::exp(2.0f * x - 2.0f), 10.0f);
      else if (x >= 0.9f)
        bound = (x - 0.9f) * 10.0f;
      r -= bound;
    }
    rew[ADV + g] = r;
  }

  const bool episode_done = s.step >= e.max_steps;
  *done = episode_done ? 1 : 0;
  if (episode_done && auto_reset) reset_env(e, s);
  if (obs_out != nullptr) observe_env(e, s, obs_out);
}

// simple_world_comm step (mpe.py SimpleWorldCommEnv.step_stacked): same
// integrator as tag with good size .045; collidable entities = agents +
// obstacles; leader comm = one_hot(action0 // 5); published reward
// structure incl. the +0.05*min-food-dist sign quirk.
void step_wc(const Engine& e, EnvState& s, const int32_t* actions, float* rew,
             uint8_t* done, bool auto_reset, float* obs_out) {
  // discrete only (the reference path; the leader action encodes comm)
  const int A = e.n_agents, ADV = e.n_adv, G = e.n_good;
  // collidable: agents + obstacles only (food/forests pass through)
  apply_movement(e, s, actions, nullptr, kAdvSize, kGoodSizeWc, kAdvAccel,
                 kGoodAccel, e.n_obs_lmk, /*clip_speed=*/true);
  const int comm_idx =
      std::min(std::max(actions[0] / 5, 0), e.dim_c - 1);
  std::fill(s.comm.begin(), s.comm.end(), 0.0f);
  s.comm[comm_idx] = 1.0f;

  // rewards from the NEW state
  const float coll_dist = kAdvSize + kGoodSizeWc;
  float total_coll = 0.0f;
  static thread_local std::vector<float> touch;
  touch.assign(G, 0.0f);
  for (int i = 0; i < ADV; ++i) {
    float min_d = std::numeric_limits<float>::infinity();
    for (int g = 0; g < G; ++g) {
      const float dx = s.pos[2 * i] - s.pos[2 * (ADV + g)];
      const float dy = s.pos[2 * i + 1] - s.pos[2 * (ADV + g) + 1];
      const float d = std::sqrt(dx * dx + dy * dy);
      min_d = std::min(min_d, d);
      if (d < coll_dist) {
        total_coll += 1.0f;
        touch[g] += 1.0f;
      }
    }
    rew[i] = -0.1f * min_d;  // shaping; team term added below
  }
  for (int i = 0; i < ADV; ++i) rew[i] += kWcCollisionReward * total_coll;
  const int food0 = e.n_obs_lmk;
  for (int g = 0; g < G; ++g) {
    float r = -kWcCollisionReward * touch[g];
    for (int c = 0; c < 2; ++c) {
      const float x = std::fabs(s.pos[2 * (ADV + g) + c]);
      float bound = 0.0f;
      if (x >= 1.0f)
        bound = std::min(std::exp(2.0f * x - 2.0f), 10.0f);
      else if (x >= 0.9f)
        bound = (x - 0.9f) * 10.0f;
      r -= 2.0f * bound;
    }
    float min_food = std::numeric_limits<float>::infinity();
    for (int f = 0; f < e.n_food; ++f) {
      const float dx = s.pos[2 * (ADV + g)] - s.lmk[2 * (food0 + f)];
      const float dy = s.pos[2 * (ADV + g) + 1] - s.lmk[2 * (food0 + f) + 1];
      const float d = std::sqrt(dx * dx + dy * dy);
      min_food = std::min(min_food, d);
      if (d < kGoodSizeWc + kFoodSize) r += kFoodReward;
    }
    r += 0.05f * min_food;  // published positive-shaping quirk
    rew[ADV + g] = r;
  }
  for (int i = 0; i < A; ++i) {
    if (std::fabs(s.pos[2 * i]) > 1.0f || std::fabs(s.pos[2 * i + 1]) > 1.0f)
      rew[i] -= kBoundaryExitPenalty;
  }

  const bool episode_done = s.step >= e.max_steps;
  *done = episode_done ? 1 : 0;
  if (episode_done && auto_reset) reset_env(e, s);
  if (obs_out != nullptr) observe_env(e, s, obs_out);
}

// simple_adversary step (mpe.py SimpleAdversaryEnv.step_stacked): pure
// kinematics (collide=False everywhere), accel 5, no speed clip; shaped
// deception rewards from the NEW state.
void step_adversary(const Engine& e, EnvState& s, const int32_t* actions,
                    const float* cactions, float* rew, uint8_t* done,
                    bool auto_reset, float* obs_out) {
  const int A = e.n_agents;
  static const float dirs[5][2] = {
      {0.f, 0.f}, {-1.f, 0.f}, {1.f, 0.f}, {0.f, -1.f}, {0.f, 1.f}};
  for (int i = 0; i < A; ++i) {
    float fx, fy;
    if (cactions != nullptr) {
      fx = cactions[2 * i] * kAdversaryAccel;
      fy = cactions[2 * i + 1] * kAdversaryAccel;
    } else {
      const int32_t m = actions[i] % 5;
      fx = dirs[m][0] * kAdversaryAccel;
      fy = dirs[m][1] * kAdversaryAccel;
    }
    s.vel[2 * i] = s.vel[2 * i] * (1.0f - kDamping) + fx * kDt;
    s.vel[2 * i + 1] = s.vel[2 * i + 1] * (1.0f - kDamping) + fy * kDt;
    s.pos[2 * i] += s.vel[2 * i] * kDt;
    s.pos[2 * i + 1] += s.vel[2 * i + 1] * kDt;
  }
  s.step += 1;

  const float gx = s.lmk[2 * s.goal], gy = s.lmk[2 * s.goal + 1];
  auto dist_to_goal = [&](int i) {
    const float dx = s.pos[2 * i] - gx, dy = s.pos[2 * i + 1] - gy;
    return std::sqrt(dx * dx + dy * dy);
  };
  const float adv_d = dist_to_goal(0);
  float best_good = std::numeric_limits<float>::infinity();
  for (int i = 1; i < A; ++i) best_good = std::min(best_good, dist_to_goal(i));
  rew[0] = -adv_d;
  for (int i = 1; i < A; ++i) rew[i] = -best_good + adv_d;

  const bool episode_done = s.step >= e.max_steps;
  *done = episode_done ? 1 : 0;
  if (episode_done && auto_reset) reset_env(e, s);
  if (obs_out != nullptr) observe_env(e, s, obs_out);
}

void step_env(const Engine& e, EnvState& s, const int32_t* actions,
              const float* cactions, float* rew, uint8_t* done,
              bool auto_reset, float* obs_out) {
  if (e.scenario == kSpread)
    step_spread(e, s, actions, cactions, rew, done, auto_reset, obs_out);
  else if (e.scenario == kWorldComm)
    step_wc(e, s, actions, rew, done, auto_reset, obs_out);
  else if (e.scenario == kAdversary)
    step_adversary(e, s, actions, cactions, rew, done, auto_reset, obs_out);
  else
    step_tag(e, s, actions, cactions, rew, done, auto_reset, obs_out);
}

void run_range(Engine* e, int lo, int hi) {
  for (int k = lo; k < hi; ++k) {
    EnvState& s = e->envs[k];
    if (e->job_step) {
      step_env(*e, s,
               e->job_actions ? e->job_actions + (size_t)k * e->n_agents
                              : nullptr,
               e->job_cactions
                   ? e->job_cactions + (size_t)k * e->n_agents * 2
                   : nullptr,
               e->job_rew + (size_t)k * e->n_agents, e->job_done + k,
               e->job_auto_reset,
               e->job_obs ? e->job_obs + (size_t)k * e->obs_stride : nullptr);
    } else {
      observe_env(*e, s, e->job_obs + (size_t)k * e->obs_stride);
    }
  }
}

void worker_main(Engine* e, int tid) {
  uint64_t seen = 0;
  const int per = (e->n_envs + e->n_threads - 1) / e->n_threads;
  const int lo = tid * per;
  const int hi = std::min(e->n_envs, lo + per);
  for (;;) {
    {
      std::unique_lock<std::mutex> lk(e->mu);
      e->cv_work.wait(lk, [&] { return e->shutdown || e->generation != seen; });
      if (e->shutdown) return;
      seen = e->generation;
    }
    if (lo < hi) run_range(e, lo, hi);
    {
      std::lock_guard<std::mutex> lk(e->mu);
      if (--e->pending == 0) e->cv_done.notify_one();
    }
  }
}

void dispatch(Engine* e) {
  if (e->workers.empty()) {  // single-threaded: run inline
    run_range(e, 0, e->n_envs);
    return;
  }
  {
    std::lock_guard<std::mutex> lk(e->mu);
    e->pending = (int)e->workers.size();
    ++e->generation;
  }
  e->cv_work.notify_all();
  std::unique_lock<std::mutex> lk(e->mu);
  e->cv_done.wait(lk, [&] { return e->pending == 0; });
}

}  // namespace

// Allocate per-env state and spin up the pool (shared by both scenarios).
void finish_create(Engine* e, uint64_t seed, int n_threads) {
  const int A = e->n_agents;
  e->envs.resize(e->n_envs);
  for (int k = 0; k < e->n_envs; ++k) {
    EnvState& s = e->envs[k];
    s.pos.assign(A * 2, 0.0f);
    s.vel.assign(A * 2, 0.0f);
    s.lmk.assign(e->n_lmk * 2, 0.0f);
    s.comm.assign(e->dim_c, 0.0f);
    s.rng.seed(seed + (uint64_t)k * 0x9E3779B97F4A7C15ull);
    reset_env(*e, s);
  }
  // a pool only pays off when each worker owns several envs
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > e->n_envs) n_threads = e->n_envs;
  if (n_threads > 1) {
    e->n_threads = n_threads;
    for (int t = 0; t < n_threads; ++t)
      e->workers.emplace_back(worker_main, e, t);
  } else {
    e->n_threads = 1;
  }
}

extern "C" {

void* mpe_create(int32_t n_envs, int32_t n_good, int32_t n_adv, int32_t n_lmk,
                 int32_t max_steps, uint64_t seed, int32_t n_threads) {
  auto* e = new Engine();
  e->scenario = kTag;
  e->n_envs = n_envs;
  e->n_good = n_good;
  e->n_adv = n_adv;
  e->n_lmk = n_lmk;
  e->max_steps = max_steps;
  e->n_agents = n_adv + n_good;
  const int A = e->n_agents;
  e->d_adv = 4 + 2 * n_lmk + 2 * (A - 1) + 2 * n_good;
  e->d_good = 4 + 2 * n_lmk + 2 * (A - 1) + 2 * (n_good - 1);
  e->obs_stride = n_adv * e->d_adv + n_good * e->d_good;
  finish_create(e, seed, n_threads);
  return e;
}

// simple_world_comm: n_adv adversaries (index 0 = the leader with a dim_c
// comm channel), n_good prey; landmarks = [n_obs obstacles | n_food food |
// n_forests forests].
void* mpe_create_worldcomm(int32_t n_envs, int32_t n_good, int32_t n_adv,
                           int32_t n_obs, int32_t n_food, int32_t n_forests,
                           int32_t dim_c, int32_t max_steps, uint64_t seed,
                           int32_t n_threads) {
  auto* e = new Engine();
  e->scenario = kWorldComm;
  e->n_envs = n_envs;
  e->n_good = n_good;
  e->n_adv = n_adv;
  e->n_obs_lmk = n_obs;
  e->n_food = n_food;
  e->n_forests = n_forests;
  e->dim_c = dim_c;
  e->n_lmk = n_obs + n_food + n_forests;
  e->max_steps = max_steps;
  e->n_agents = n_adv + n_good;
  const int A = e->n_agents, E = e->n_lmk, G = n_good;
  const int base = 4 + 2 * E + 2 * (A - 1);
  e->d_lead = base + 2 * G + n_forests + dim_c;
  e->d_adv = base + 2 * G + G + dim_c;
  e->d_good = base + 2 * (G - 1) + n_forests;
  e->obs_stride = e->d_lead + (n_adv - 1) * e->d_adv + n_good * e->d_good;
  finish_create(e, seed, n_threads);
  return e;
}

// simple_spread: n_agents homogeneous agents covering n_agents landmarks.
void* mpe_create_spread(int32_t n_envs, int32_t n_agents, int32_t max_steps,
                        uint64_t seed, int32_t n_threads) {
  auto* e = new Engine();
  e->scenario = kSpread;
  e->n_envs = n_envs;
  e->n_good = n_agents;
  e->n_adv = 0;
  e->n_lmk = n_agents;
  e->max_steps = max_steps;
  e->n_agents = n_agents;
  e->d_adv = 0;
  e->d_good = 4 + 2 * e->n_lmk + 4 * (n_agents - 1);
  e->obs_stride = n_agents * e->d_good;
  finish_create(e, seed, n_threads);
  return e;
}

// simple_adversary: 1 adversary (agent 0) + n_good good agents + n_good
// landmarks, one of which is the goal (per-env, re-chosen at reset).
void* mpe_create_adversary(int32_t n_envs, int32_t n_good, int32_t max_steps,
                           uint64_t seed, int32_t n_threads) {
  auto* e = new Engine();
  e->scenario = kAdversary;
  e->n_envs = n_envs;
  e->n_good = n_good;
  e->n_adv = 1;
  e->n_lmk = n_good;
  e->max_steps = max_steps;
  e->n_agents = n_good + 1;
  const int A = e->n_agents;
  e->d_adv = 2 * e->n_lmk + 2 * (A - 1);
  e->d_good = e->d_adv + 2;  // + goal_rel
  e->obs_stride = e->d_adv + n_good * e->d_good;
  finish_create(e, seed, n_threads);
  return e;
}

// Goal landmark accessors (simple_adversary; for state-injection tests).
int32_t mpe_get_goal(void* handle, int32_t env) {
  return static_cast<Engine*>(handle)->envs[env].goal;
}

void mpe_set_goal(void* handle, int32_t env, int32_t goal) {
  static_cast<Engine*>(handle)->envs[env].goal = goal;
}

void mpe_destroy(void* handle) {
  auto* e = static_cast<Engine*>(handle);
  if (!e->workers.empty()) {
    {
      std::lock_guard<std::mutex> lk(e->mu);
      e->shutdown = true;
    }
    e->cv_work.notify_all();
    for (auto& w : e->workers) w.join();
  }
  delete e;
}

int32_t mpe_obs_dim_adv(void* h) { return static_cast<Engine*>(h)->d_adv; }
int32_t mpe_obs_dim_good(void* h) { return static_cast<Engine*>(h)->d_good; }
int32_t mpe_obs_dim_lead(void* h) { return static_cast<Engine*>(h)->d_lead; }
int32_t mpe_obs_stride(void* h) { return static_cast<Engine*>(h)->obs_stride; }

// Leader channel accessors (world_comm; comm: [dim_c]).
void mpe_get_comm(void* handle, int32_t env, float* comm) {
  auto* e = static_cast<Engine*>(handle);
  const EnvState& s = e->envs[env];
  std::memcpy(comm, s.comm.data(), s.comm.size() * sizeof(float));
}

void mpe_set_comm(void* handle, int32_t env, const float* comm) {
  auto* e = static_cast<Engine*>(handle);
  EnvState& s = e->envs[env];
  std::memcpy(s.comm.data(), comm, s.comm.size() * sizeof(float));
}

// Fresh random episode in every env; obs_out: [n_envs * obs_stride].
void mpe_reset(void* handle, float* obs_out) {
  auto* e = static_cast<Engine*>(handle);
  for (auto& s : e->envs) reset_env(*e, s);
  e->job_step = false;
  e->job_obs = obs_out;
  dispatch(e);
}

// Reset only envs with mask[k] != 0 (no obs output).
void mpe_reset_masked(void* handle, const uint8_t* mask) {
  auto* e = static_cast<Engine*>(handle);
  for (int k = 0; k < e->n_envs; ++k)
    if (mask[k]) reset_env(*e, e->envs[k]);
}

// Observations of the current state for all envs.
void mpe_observe(void* handle, float* obs_out) {
  auto* e = static_cast<Engine*>(handle);
  e->job_step = false;
  e->job_obs = obs_out;
  dispatch(e);
}

// Step all envs.  actions: [n_envs * A] int32 in [0, 5); obs_out may be
// null; rew_out: [n_envs * A]; done_out: [n_envs].  With auto_reset, a
// finished env is reset and obs_out carries the new episode's first obs
// (rew/done still describe the terminal step).
void mpe_step(void* handle, const int32_t* actions, float* obs_out,
              float* rew_out, uint8_t* done_out, int32_t auto_reset) {
  auto* e = static_cast<Engine*>(handle);
  e->job_step = true;
  e->job_actions = actions;
  e->job_cactions = nullptr;
  e->job_obs = obs_out;
  e->job_rew = rew_out;
  e->job_done = done_out;
  e->job_auto_reset = auto_reset != 0;
  dispatch(e);
  e->job_step = false;
}

// Continuous-action step (tag/spread/adversary; the action IS the 2-d
// force direction, scaled by the agent's accel — mpe.py _action_force's
// non-discrete branch).  actions: [n_envs * A * 2] float32.  Returns -1
// for world_comm (discrete only: the leader action encodes comm).
int32_t mpe_step_cont(void* handle, const float* actions, float* obs_out,
                      float* rew_out, uint8_t* done_out, int32_t auto_reset) {
  auto* e = static_cast<Engine*>(handle);
  if (e->scenario == kWorldComm) return -1;
  e->job_step = true;
  e->job_actions = nullptr;
  e->job_cactions = actions;
  e->job_obs = obs_out;
  e->job_rew = rew_out;
  e->job_done = done_out;
  e->job_auto_reset = auto_reset != 0;
  dispatch(e);
  e->job_step = false;
  e->job_cactions = nullptr;
  return 0;
}

// State injection/extraction for fidelity tests and checkpointing.
// pos/vel: [A*2], lmk: [L*2].  NOTE: the simple_adversary goal index is
// scenario state carried separately via mpe_get_goal/mpe_set_goal (the
// Python NativeSimpleAdversaryEnv.get_state/set_state round-trip it).
void mpe_get_state(void* handle, int32_t env, float* pos, float* vel,
                   float* lmk, int32_t* step) {
  auto* e = static_cast<Engine*>(handle);
  const EnvState& s = e->envs[env];
  std::memcpy(pos, s.pos.data(), s.pos.size() * sizeof(float));
  std::memcpy(vel, s.vel.data(), s.vel.size() * sizeof(float));
  std::memcpy(lmk, s.lmk.data(), s.lmk.size() * sizeof(float));
  *step = s.step;
}

// Batched read-only accessors for host-side scripted policies: one ctypes
// call for all envs instead of a per-env get_state loop.
// out: [n_envs * A * 2] / [n_envs * L * 2] / [n_envs].
void mpe_get_positions(void* handle, float* out) {
  auto* e = static_cast<Engine*>(handle);
  const size_t n = (size_t)e->n_agents * 2;
  for (int k = 0; k < e->n_envs; ++k)
    std::memcpy(out + (size_t)k * n, e->envs[k].pos.data(), n * sizeof(float));
}

void mpe_get_landmarks(void* handle, float* out) {
  auto* e = static_cast<Engine*>(handle);
  const size_t n = (size_t)e->n_lmk * 2;
  for (int k = 0; k < e->n_envs; ++k)
    std::memcpy(out + (size_t)k * n, e->envs[k].lmk.data(), n * sizeof(float));
}

void mpe_get_goals(void* handle, int32_t* out) {
  auto* e = static_cast<Engine*>(handle);
  for (int k = 0; k < e->n_envs; ++k) out[k] = e->envs[k].goal;
}

void mpe_set_state(void* handle, int32_t env, const float* pos,
                   const float* vel, const float* lmk, int32_t step) {
  auto* e = static_cast<Engine*>(handle);
  EnvState& s = e->envs[env];
  std::memcpy(s.pos.data(), pos, s.pos.size() * sizeof(float));
  std::memcpy(s.vel.data(), vel, s.vel.size() * sizeof(float));
  std::memcpy(s.lmk.data(), lmk, s.lmk.size() * sizeof(float));
  s.step = step;
}

}  // extern "C"
