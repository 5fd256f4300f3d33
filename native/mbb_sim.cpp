// Native CPU batch executor for madrona_basketball_tpu.
//
// The TPU-native equivalent of the reference's CPU multi-world path
// (madrona TaskGraphExecutor, reference src/mgr.cpp:49-81): a multithreaded
// C++ implementation of the full 19-system step chain over the SAME flat
// SoA row layout the fused TPU kernel uses (column = world, row = field;
// see madrona_basketball_tpu/ops/layout.py, row indices codegen'd into
// layout_generated.h).  Roles:
//   * CPU deployment/inference executor (no XLA needed),
//   * independent third implementation for cross-validation,
//   * high-speed golden-fixture generation.
//
// Semantics follow reference src/game.cpp / src/gen.cpp / src/helper.cpp
// with the defined agent-index sequential ordering; RNG is injected as
// pre-drawn uniforms (same contract as the JAX engines).
//
// Build: g++ -O3 -shared -fPIC -o libmbb_sim.so mbb_sim.cpp -lpthread

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>
#include <thread>
#include <vector>

#include "layout_generated.h"

namespace {

constexpr int NUM_AGENTS = 2;
constexpr int NUM_HOOPS = 2;
constexpr int32_t PLACEHOLDER = 2147483647;
constexpr int32_t HOOP_ID0 = 0, HOOP_ID1 = 1;
constexpr int32_t BALL_ID = 2;
constexpr int32_t AGENT_ID[2] = {3, 4};
constexpr float SIM_HZ = 62.0f;
constexpr float DT = 1.0f / SIM_HZ;
constexpr float COURT_LENGTH = 28.65f;
constexpr float COURT_WIDTH = 15.24f;
constexpr float WORLD_W = COURT_LENGTH * 1.1f;
constexpr float WORLD_H = COURT_WIDTH * 1.1f;
constexpr float COURT_MIN_X = (WORLD_W - COURT_LENGTH) / 2.0f;
constexpr float COURT_MAX_X = COURT_MIN_X + COURT_LENGTH;
constexpr float COURT_MIN_Y = (WORLD_H - COURT_WIDTH) / 2.0f;
constexpr float COURT_MAX_Y = COURT_MIN_Y + COURT_WIDTH;
constexpr float CORNER3_SIDE = 0.91f;
constexpr float CORNER3_LEN = 4.27f;
constexpr float ARC_R = 7.24f;
constexpr float ZONE_R = 0.1f;
constexpr float HOOP_FROM_BASELINE = 1.575f;
constexpr float SHOULDER = 0.4290f;
constexpr float DEPTH = 0.1f;
constexpr float GUARD_DIST = 0.2f;
constexpr float START_STDDEV = 5.0f;
constexpr float DEF_SPAWN_R = 8.0f;
constexpr float PPM = 110.0f;
constexpr float DIST_DEV = 0.008f;
constexpr float DEF_DEV = 0.002f;
constexpr float VEL_DEV = 0.001f;

struct Config {
    float grid_w, grid_h, start_x, start_y;
    float time_per_period, shot_clock;
    int32_t tag_mode;
    int32_t n_threads;
};

struct Vec3 {
    float x, y, z;
    Vec3 operator+(const Vec3 &o) const { return {x + o.x, y + o.y, z + o.z}; }
    Vec3 operator-(const Vec3 &o) const { return {x - o.x, y - o.y, z - o.z}; }
    Vec3 operator*(float s) const { return {x * s, y * s, z * s}; }
    float dot(const Vec3 &o) const { return x * o.x + y * o.y + z * o.z; }
    float len2() const { return dot(*this); }
    float len() const { return std::sqrt(len2()); }
    Vec3 normalized() const { float l = len(); return {x / l, y / l, z / l}; }
};

struct Quat {
    float w, x, y, z;
};

static inline Quat quat_mul(const Quat &a, const Quat &b) {
    return {a.w * b.w - a.x * b.x - a.y * b.y - a.z * b.z,
            a.w * b.x + a.x * b.w + a.y * b.z - a.z * b.y,
            a.w * b.y - a.x * b.z + a.y * b.w + a.z * b.x,
            a.w * b.z + a.x * b.y - a.y * b.x + a.z * b.w};
}

static inline Vec3 quat_rotate(const Quat &q, const Vec3 &v) {
    Vec3 u{q.x, q.y, q.z};
    Vec3 t{2.0f * (u.y * v.z - u.z * v.y), 2.0f * (u.z * v.x - u.x * v.z),
           2.0f * (u.x * v.y - u.y * v.x)};
    Vec3 c{u.y * t.z - u.z * t.y, u.z * t.x - u.x * t.z,
           u.x * t.y - u.y * t.x};
    return {v.x + q.w * t.x + c.x, v.y + q.w * t.y + c.y,
            v.z + q.w * t.z + c.z};
}

static inline Quat quat_angle_axis(float angle, const Vec3 &axis) {
    float h = angle * 0.5f;
    float s = std::sin(h);
    return {std::cos(h), axis.x * s, axis.y * s, axis.z * s};
}

// src/helper.cpp:14-42
static inline Quat rot_between(const Vec3 &start, const Vec3 &target) {
    Vec3 s = start.normalized(), t = target.normalized();
    float d = s.dot(t);
    if (d > 0.999999f) return {1, 0, 0, 0};
    if (d < -0.999999f) return quat_angle_axis(M_PI, {0, 0, 1});
    Vec3 axis{s.y * t.z - s.z * t.y, s.z * t.x - s.x * t.z,
              s.x * t.y - s.y * t.x};
    axis = axis.normalized();
    return quat_angle_axis(std::acos(d), axis);
}

// Per-world mutable view of the column data.
struct Agent {
    Vec3 pos, vel, target;
    Quat q;
    float reward, done, cooldown, stat_points, stat_fouls;
    float max_speed, quickness, shooting, ft_pct, reaction, shot_pct;
    float color_r, color_g, color_b;
    int32_t action[6];  // move, angle, rotate, grab, pass, shoot
    int32_t mask[4];    // move, grab, pass, shoot
    int32_t reset, cur_step, has_ball, held_ball, points_worth;
    int32_t im_inb, allowed_move, team, defend_hoop;
};

struct Ball {
    Vec3 pos, vel;
    float done;
    int32_t grabbed, holder, in_flight, lt_agent, lt_team, sb_agent, sb_team;
    int32_t spv, sgi, reset, cur_step;
};

struct Game {
    float period, tip, t0score, t1score, gclock, sclock, sbaskets, oob,
        iclock;
    int32_t ginb, glive, t0hoop, t1hoop, is1v1, reset_now;
};

struct World {
    Agent ag[NUM_AGENTS];
    Ball ball;
    Game g;
    float hdone[2];
    int32_t hcur[2], hreset[2];
    // noise
    float shot_u[NUM_AGENTS][3];
    float reset_x, reset_y, reset_angle;
};

#define GF(row) sf[(size_t)(row) * W + w]
#define GI(row) si[(size_t)(row) * W + w]

static void load_world(const float *sf, const int32_t *si,
                       const float *noise, size_t W, size_t w, World &o) {
#define LA(i, P)                                                             \
    o.ag[i].pos = {GF(F_A##i##_POS_X), GF(F_A##i##_POS_Y),                   \
                   GF(F_A##i##_POS_Z)};                                      \
    o.ag[i].vel = {GF(F_A##i##_VEL_X), GF(F_A##i##_VEL_Y),                   \
                   GF(F_A##i##_VEL_Z)};                                      \
    o.ag[i].q = {GF(F_A##i##_QUAT_W), GF(F_A##i##_QUAT_X),                   \
                 GF(F_A##i##_QUAT_Y), GF(F_A##i##_QUAT_Z)};                  \
    o.ag[i].target = {GF(F_A##i##_TARGET_X), GF(F_A##i##_TARGET_Y),          \
                      GF(F_A##i##_TARGET_Z)};                                \
    o.ag[i].reward = GF(F_A##i##_REWARD);                                    \
    o.ag[i].done = GF(F_A##i##_DONE);                                        \
    o.ag[i].cooldown = GF(F_A##i##_COOLDOWN);                                \
    o.ag[i].stat_points = GF(F_A##i##_STAT_POINTS);                          \
    o.ag[i].stat_fouls = GF(F_A##i##_STAT_FOULS);                            \
    o.ag[i].max_speed = GF(F_A##i##_MAX_SPEED);                              \
    o.ag[i].quickness = GF(F_A##i##_QUICKNESS);                              \
    o.ag[i].shooting = GF(F_A##i##_SHOOTING);                                \
    o.ag[i].ft_pct = GF(F_A##i##_FT_PCT);                                    \
    o.ag[i].reaction = GF(F_A##i##_REACTION);                                \
    o.ag[i].shot_pct = GF(F_A##i##_SHOT_PCT);                                \
    o.ag[i].color_r = GF(F_A##i##_COLOR_R);                                  \
    o.ag[i].color_g = GF(F_A##i##_COLOR_G);                                  \
    o.ag[i].color_b = GF(F_A##i##_COLOR_B);                                  \
    o.ag[i].action[0] = GI(I_A##i##_A_MOVE);                                 \
    o.ag[i].action[1] = GI(I_A##i##_A_ANGLE);                                \
    o.ag[i].action[2] = GI(I_A##i##_A_ROTATE);                               \
    o.ag[i].action[3] = GI(I_A##i##_A_GRAB);                                 \
    o.ag[i].action[4] = GI(I_A##i##_A_PASS);                                 \
    o.ag[i].action[5] = GI(I_A##i##_A_SHOOT);                                \
    o.ag[i].mask[0] = GI(I_A##i##_M_MOVE);                                   \
    o.ag[i].mask[1] = GI(I_A##i##_M_GRAB);                                   \
    o.ag[i].mask[2] = GI(I_A##i##_M_PASS);                                   \
    o.ag[i].mask[3] = GI(I_A##i##_M_SHOOT);                                  \
    o.ag[i].reset = GI(I_A##i##_RESET);                                      \
    o.ag[i].cur_step = GI(I_A##i##_CUR_STEP);                                \
    o.ag[i].has_ball = GI(I_A##i##_HAS_BALL);                                \
    o.ag[i].held_ball = GI(I_A##i##_HELD_BALL);                              \
    o.ag[i].points_worth = GI(I_A##i##_POINTS_WORTH);                        \
    o.ag[i].im_inb = GI(I_A##i##_IM_INB);                                    \
    o.ag[i].allowed_move = GI(I_A##i##_ALLOWED_MOVE);                        \
    o.ag[i].team = GI(I_A##i##_TEAM);                                        \
    o.ag[i].defend_hoop = GI(I_A##i##_DEFEND_HOOP);
    LA(0, )
    LA(1, )
#undef LA
    o.ball.pos = {GF(F_BPOS_X), GF(F_BPOS_Y), GF(F_BPOS_Z)};
    o.ball.vel = {GF(F_BVEL_X), GF(F_BVEL_Y), GF(F_BVEL_Z)};
    o.ball.done = GF(F_BDONE);
    o.ball.grabbed = GI(I_BGRABBED);
    o.ball.holder = GI(I_BHOLDER);
    o.ball.in_flight = GI(I_BINFLIGHT);
    o.ball.lt_agent = GI(I_BLT_AGENT);
    o.ball.lt_team = GI(I_BLT_TEAM);
    o.ball.sb_agent = GI(I_BSB_AGENT);
    o.ball.sb_team = GI(I_BSB_TEAM);
    o.ball.spv = GI(I_BSPV);
    o.ball.sgi = GI(I_BSGI);
    o.ball.reset = GI(I_BRESET);
    o.ball.cur_step = GI(I_BCUR_STEP);
    o.g.period = GF(F_PERIOD);
    o.g.tip = GF(F_TIP);
    o.g.t0score = GF(F_T0SCORE);
    o.g.t1score = GF(F_T1SCORE);
    o.g.gclock = GF(F_GCLOCK);
    o.g.sclock = GF(F_SCLOCK);
    o.g.sbaskets = GF(F_SBASKETS);
    o.g.oob = GF(F_OOB);
    o.g.iclock = GF(F_ICLOCK);
    o.g.ginb = GI(I_GINB);
    o.g.glive = GI(I_GLIVE);
    o.g.t0hoop = GI(I_T0HOOP);
    o.g.t1hoop = GI(I_T1HOOP);
    o.g.is1v1 = GI(I_IS1V1);
    o.g.reset_now = GI(I_RESET_NOW);
    o.hdone[0] = GF(F_HDONE0);
    o.hdone[1] = GF(F_HDONE1);
    o.hcur[0] = GI(I_HCUR0);
    o.hcur[1] = GI(I_HCUR1);
    o.hreset[0] = GI(I_HRESET0);
    o.hreset[1] = GI(I_HRESET1);
    for (int i = 0; i < NUM_AGENTS; i++)
        for (int k = 0; k < 3; k++)
            o.shot_u[i][k] = noise[(size_t)(3 * i + k) * W + w];
    o.reset_x = noise[(size_t)(3 * NUM_AGENTS + 0) * W + w];
    o.reset_y = noise[(size_t)(3 * NUM_AGENTS + 1) * W + w];
    o.reset_angle = noise[(size_t)(3 * NUM_AGENTS + 2) * W + w];
}

static void store_world(float *sf, int32_t *si, size_t W, size_t w,
                        const World &o) {
#define SA(i, P)                                                             \
    GF(F_A##i##_POS_X) = o.ag[i].pos.x;                                      \
    GF(F_A##i##_POS_Y) = o.ag[i].pos.y;                                      \
    GF(F_A##i##_POS_Z) = o.ag[i].pos.z;                                      \
    GF(F_A##i##_VEL_X) = o.ag[i].vel.x;                                      \
    GF(F_A##i##_VEL_Y) = o.ag[i].vel.y;                                      \
    GF(F_A##i##_VEL_Z) = o.ag[i].vel.z;                                      \
    GF(F_A##i##_QUAT_W) = o.ag[i].q.w;                                       \
    GF(F_A##i##_QUAT_X) = o.ag[i].q.x;                                       \
    GF(F_A##i##_QUAT_Y) = o.ag[i].q.y;                                       \
    GF(F_A##i##_QUAT_Z) = o.ag[i].q.z;                                       \
    GF(F_A##i##_TARGET_X) = o.ag[i].target.x;                                \
    GF(F_A##i##_TARGET_Y) = o.ag[i].target.y;                                \
    GF(F_A##i##_TARGET_Z) = o.ag[i].target.z;                                \
    GF(F_A##i##_REWARD) = o.ag[i].reward;                                    \
    GF(F_A##i##_DONE) = o.ag[i].done;                                        \
    GF(F_A##i##_COOLDOWN) = o.ag[i].cooldown;                                \
    GF(F_A##i##_STAT_POINTS) = o.ag[i].stat_points;                          \
    GF(F_A##i##_STAT_FOULS) = o.ag[i].stat_fouls;                            \
    GF(F_A##i##_MAX_SPEED) = o.ag[i].max_speed;                              \
    GF(F_A##i##_QUICKNESS) = o.ag[i].quickness;                              \
    GF(F_A##i##_SHOOTING) = o.ag[i].shooting;                                \
    GF(F_A##i##_FT_PCT) = o.ag[i].ft_pct;                                    \
    GF(F_A##i##_REACTION) = o.ag[i].reaction;                                \
    GF(F_A##i##_SHOT_PCT) = o.ag[i].shot_pct;                                \
    GF(F_A##i##_COLOR_R) = o.ag[i].color_r;                                  \
    GF(F_A##i##_COLOR_G) = o.ag[i].color_g;                                  \
    GF(F_A##i##_COLOR_B) = o.ag[i].color_b;                                  \
    GI(I_A##i##_A_MOVE) = o.ag[i].action[0];                                 \
    GI(I_A##i##_A_ANGLE) = o.ag[i].action[1];                                \
    GI(I_A##i##_A_ROTATE) = o.ag[i].action[2];                               \
    GI(I_A##i##_A_GRAB) = o.ag[i].action[3];                                 \
    GI(I_A##i##_A_PASS) = o.ag[i].action[4];                                 \
    GI(I_A##i##_A_SHOOT) = o.ag[i].action[5];                                \
    GI(I_A##i##_M_MOVE) = o.ag[i].mask[0];                                   \
    GI(I_A##i##_M_GRAB) = o.ag[i].mask[1];                                   \
    GI(I_A##i##_M_PASS) = o.ag[i].mask[2];                                   \
    GI(I_A##i##_M_SHOOT) = o.ag[i].mask[3];                                  \
    GI(I_A##i##_RESET) = o.ag[i].reset;                                      \
    GI(I_A##i##_CUR_STEP) = o.ag[i].cur_step;                                \
    GI(I_A##i##_HAS_BALL) = o.ag[i].has_ball;                                \
    GI(I_A##i##_HELD_BALL) = o.ag[i].held_ball;                              \
    GI(I_A##i##_POINTS_WORTH) = o.ag[i].points_worth;                        \
    GI(I_A##i##_IM_INB) = o.ag[i].im_inb;                                    \
    GI(I_A##i##_ALLOWED_MOVE) = o.ag[i].allowed_move;                        \
    GI(I_A##i##_TEAM) = o.ag[i].team;                                        \
    GI(I_A##i##_DEFEND_HOOP) = o.ag[i].defend_hoop;
    SA(0, )
    SA(1, )
#undef SA
    GF(F_BPOS_X) = o.ball.pos.x;
    GF(F_BPOS_Y) = o.ball.pos.y;
    GF(F_BPOS_Z) = o.ball.pos.z;
    GF(F_BVEL_X) = o.ball.vel.x;
    GF(F_BVEL_Y) = o.ball.vel.y;
    GF(F_BVEL_Z) = o.ball.vel.z;
    GF(F_BDONE) = o.ball.done;
    GI(I_BGRABBED) = o.ball.grabbed;
    GI(I_BHOLDER) = o.ball.holder;
    GI(I_BINFLIGHT) = o.ball.in_flight;
    GI(I_BLT_AGENT) = o.ball.lt_agent;
    GI(I_BLT_TEAM) = o.ball.lt_team;
    GI(I_BSB_AGENT) = o.ball.sb_agent;
    GI(I_BSB_TEAM) = o.ball.sb_team;
    GI(I_BSPV) = o.ball.spv;
    GI(I_BSGI) = o.ball.sgi;
    GI(I_BRESET) = o.ball.reset;
    GI(I_BCUR_STEP) = o.ball.cur_step;
    GF(F_PERIOD) = o.g.period;
    GF(F_TIP) = o.g.tip;
    GF(F_T0SCORE) = o.g.t0score;
    GF(F_T1SCORE) = o.g.t1score;
    GF(F_GCLOCK) = o.g.gclock;
    GF(F_SCLOCK) = o.g.sclock;
    GF(F_SBASKETS) = o.g.sbaskets;
    GF(F_OOB) = o.g.oob;
    GF(F_ICLOCK) = o.g.iclock;
    GI(I_GINB) = o.g.ginb;
    GI(I_GLIVE) = o.g.glive;
    GI(I_T0HOOP) = o.g.t0hoop;
    GI(I_T1HOOP) = o.g.t1hoop;
    GI(I_IS1V1) = o.g.is1v1;
    GI(I_RESET_NOW) = o.g.reset_now;
    GF(F_HDONE0) = o.hdone[0];
    GF(F_HDONE1) = o.hdone[1];
    GI(I_HCUR0) = o.hcur[0];
    GI(I_HCUR1) = o.hcur[1];
    GI(I_HRESET0) = o.hreset[0];
    GI(I_HRESET1) = o.hreset[1];
}

struct HoopGeom {
    Vec3 pos[2];
};

static HoopGeom hoop_geom(const Config &cfg) {
    float csx = (cfg.grid_w - COURT_LENGTH) / 2.0f;
    float cy = cfg.grid_h / 2.0f;
    return {{{csx + HOOP_FROM_BASELINE, cy, 0.0f},
             {csx + COURT_LENGTH - HOOP_FROM_BASELINE, cy, 0.0f}}};
}

// src/helper.cpp:50-81
static int32_t shot_point_value(const Vec3 &pos, const Vec3 &hoop) {
    float dist = (pos - hoop).len();
    bool corner = pos.y < COURT_MIN_Y + CORNER3_SIDE ||
                  pos.y > COURT_MIN_Y + COURT_WIDTH - CORNER3_SIDE;
    if (corner) {
        if (hoop.x < WORLD_W / 2.0f) {
            if (pos.x <= COURT_MIN_X + CORNER3_LEN) return 3;
        } else {
            if (pos.x >= COURT_MIN_X + COURT_LENGTH - CORNER3_LEN) return 3;
        }
    }
    if (dist >= ARC_R) return 3;
    return 2;
}

static Vec3 to_center(const Config &cfg, const Vec3 &pos) {
    return (Vec3{cfg.start_x, cfg.start_y, 0} - pos).normalized();
}

// src/game.cpp:14-53
static void assign_inbounder(const Config &cfg, World &o, int32_t new_team,
                             const Vec3 &spot, const Quat &orient,
                             bool is_oob) {
    bool assigned = false;
    for (int i = 0; i < NUM_AGENTS; i++) {
        Agent &a = o.ag[i];
        if (a.team == new_team && !assigned) {
            assigned = true;
            a.im_inb = 1;
            a.pos = spot;
            o.ball.grabbed = 1;
            o.ball.holder = AGENT_ID[i];
            a.has_ball = 1;
            a.held_ball = BALL_ID;
            a.q = orient;
        }
    }
    if (assigned) {
        o.g.tip = (float)new_team;
        o.g.ginb = 1;
        o.g.iclock = 5.0f;
        if (is_oob) o.g.oob += 1.0f;
    }
}

// src/helper.cpp:108-160
static void setup_agent_positions(const Config &cfg, World &o,
                                  Vec3 &ball_spawn) {
    ball_spawn = {cfg.start_x, cfg.start_y, 0};
    for (int i = 0; i < NUM_AGENTS; i++) {
        Agent &a = o.ag[i];
        if (o.g.is1v1 == 1) {
            if (i == 0) {
                Vec3 base{cfg.start_x + i * 2.0f, cfg.start_y, 0};
                a.pos = base + Vec3{o.reset_x * START_STDDEV,
                                    o.reset_y * START_STDDEV, 0};
                a.pos.x = std::clamp(a.pos.x, 0.0f, cfg.grid_w);
                a.pos.y = std::clamp(a.pos.y, 0.0f, cfg.grid_h);
                ball_spawn = a.pos;
                a.has_ball = 1;
                a.held_ball = BALL_ID;
                a.points_worth = 2;
            } else {
                float ang = o.reset_angle * 2.0f * (float)M_PI;
                a.pos = ball_spawn + Vec3{DEF_SPAWN_R * std::cos(ang),
                                          DEF_SPAWN_R * std::sin(ang), 0};
                a.pos.x = std::clamp(a.pos.x, 0.0f, cfg.grid_w);
                a.pos.y = std::clamp(a.pos.y, 0.0f, cfg.grid_h);
                a.has_ball = 0;
                a.held_ball = PLACEHOLDER;
                a.points_worth = 2;
            }
        } else {
            a.pos = {cfg.start_x - 1 + 2 * (i % 2),
                     cfg.start_y - 2 + (float)(i / 2), 0};
            a.has_ball = (i == 0) ? 1 : 0;
            a.held_ball = (i == 0) ? BALL_ID : PLACEHOLDER;
            a.points_worth = 2;
        }
        a.max_speed = 3.0f - i * 0.2f;
        a.quickness = 1.0f;
        a.shooting = 0.0f;
        a.ft_pct = 0.0f;
        a.reaction = i * 10.0f;
        a.target = a.pos;
        a.shot_pct = 0.0f;
    }
}

// src/gen.cpp:216-316
static void reset_world(const Config &cfg, World &o) {
    Game &g = o.g;
    if (g.gclock <= 0.0f && g.is1v1 == 0) {
        if (g.period < 4.0f || g.t0score == g.t1score) {
            g.period += 1.0f;
            g.gclock = cfg.time_per_period;
            g.sclock = cfg.shot_clock;
            g.glive = 1;
            g.ginb = 0;
        } else {
            g.glive = 0;
        }
    } else {
        g.ginb = 0;
        g.glive = 1;
        g.period = 1.0f;
        g.tip = 0.0f;
        g.t0score = 0.0f;
        g.t1score = 0.0f;
        g.gclock = cfg.time_per_period;
        g.sclock = cfg.shot_clock;
        g.sbaskets = 0.0f;
        g.oob = 0.0f;
        g.iclock = 0.0f;
    }
    const float colors[2][3] = {{0, 100, 255}, {255, 0, 100}};
    for (int i = 0; i < NUM_AGENTS; i++) {
        Agent &a = o.ag[i];
        std::memset(a.action, 0, sizeof(a.action));
        std::memset(a.mask, 0, sizeof(a.mask));
        a.reset = 0;
        a.im_inb = 0;
        a.allowed_move = 1;
        a.done = 1.0f;
        a.cur_step = 0;
        float sign = (i % 2 == 0) ? -1.0f : 1.0f;
        a.q = quat_angle_axis(sign * (float)M_PI / 2.0f, {0, 0, 1});
        a.cooldown = 0.0f;
        a.stat_points = 0.0f;
        a.stat_fouls = 0.0f;
        a.vel = {0, 0, 0};
        a.team = i % 2;
        a.color_r = colors[i % 2][0];
        a.color_g = colors[i % 2][1];
        a.color_b = colors[i % 2][2];
        a.defend_hoop = (i % 2 == 0) ? g.t0hoop : g.t1hoop;
    }
    Vec3 spawn;
    setup_agent_positions(cfg, o, spawn);
    Ball &b = o.ball;
    b.pos = spawn;
    b.reset = 0;
    b.done = 1.0f;
    b.cur_step = 0;
    b.in_flight = 0;
    b.lt_agent = b.lt_team = b.sb_agent = b.sb_team = PLACEHOLDER;
    b.spv = 2;
    b.sgi = 0;
    b.vel = {0, 0, 0};
    if (g.is1v1 == 1) {
        b.grabbed = 1;
        b.holder = AGENT_ID[0];
    } else {
        b.grabbed = 0;
        b.holder = PLACEHOLDER;
    }
    for (int h = 0; h < 2; h++) {
        o.hdone[h] = 1.0f;
        o.hcur[h] = 0;
        o.hreset[h] = 0;
    }
}

static void step_world(const Config &cfg, World &o, float *obs_out,
                       size_t W, size_t w) {
    const HoopGeom hoops = hoop_geom(cfg);
    Game &g = o.g;
    Ball &b = o.ball;

    // 1. tick (src/game.cpp:969-988)
    for (auto &a : o.ag) {
        a.reward = 0.0f;
        if (a.reset == 1) {
            a.done = 1.0f;
            a.cur_step = 0;
        } else {
            a.done = 0.0f;
            a.cur_step += 1;
        }
        a.cooldown = std::max(0.0f, a.cooldown - 1.0f);
    }

    // 2. actionMask (src/game.cpp:489-533)
    for (auto &a : o.ag) {
        a.mask[0] = 1;
        a.mask[1] = 1;
        a.mask[2] = a.has_ball == 1 ? 1 : 0;
        a.mask[3] = a.has_ball == 1 ? 1 : 0;
        if (g.ginb == 1) {
            a.mask[3] = 0;
            a.mask[1] = 0;
            if (a.im_inb == 1 && g.glive == 0) a.mask[0] = 0;
        }
        if (a.cooldown > 0.0f) a.mask[1] = 0;
        if (cfg.tag_mode) {
            a.mask[2] = 0;
            a.mask[1] = 0;
        }
    }

    // 3. moveAgent (src/game.cpp:410-486)
    for (auto &a : o.ag) {
        if (a.action[2] != 0) {
            float ang = (a.action[2] == 1 ? 1.0f : -1.0f) *
                        (float)M_PI / 180.0f * 6.0f;
            a.q = quat_mul(quat_angle_axis(ang, {0, 0, 1}), a.q);
        }
        if (a.mask[0] == 0) continue;
        float ma = a.action[1] * (float)M_PI / 4.0f;
        Vec3 dv = Vec3{std::sin(ma), -std::cos(ma), 0} *
                  (a.quickness * (float)a.action[0]);
        float max_speed = a.max_speed;
        Vec3 ov = quat_rotate(a.q, {0, 1, 0});
        float dot = 0.0f;
        if (a.vel.len2() > 1e-6f) dot = a.vel.normalized().dot(ov);
        if (dot < -0.1f) {
            max_speed *= 0.1f;
            dv = dv * 0.1f;
        } else if (dot <= 0.8f) {
            max_speed *= 0.7f;
            dv = dv * 0.1f;
        }
        a.vel = a.vel + dv;
        if (a.has_ball == 1) max_speed *= 0.9f;
        if (a.vel.len() > max_speed) a.vel = a.vel * (max_speed / a.vel.len());
        a.pos.x = std::clamp(a.pos.x + a.vel.x * DT, 0.0f, cfg.grid_w);
        a.pos.y = std::clamp(a.pos.y + a.vel.y * DT, 0.0f, cfg.grid_h);
        a.vel = a.vel * 0.95f;
    }

    // 4. grab (src/game.cpp:164-239)
    for (int i = 0; i < NUM_AGENTS; i++) {
        Agent &a = o.ag[i];
        if (a.mask[1] == 0 || a.action[3] == 0) continue;
        a.cooldown = 10.0f;
        a.action[3] = 0;
        if (b.in_flight == 1) continue;
        bool holding = a.has_ball == 1 && b.grabbed == 1 &&
                       b.holder == AGENT_ID[i];
        if (holding) {
            a.held_ball = PLACEHOLDER;
            a.has_ball = 0;
            b.holder = PLACEHOLDER;
            b.grabbed = 0;
            continue;
        }
        if ((b.pos - a.pos).len() <= 0.3f) {
            if (g.is1v1 == 1 && (float)a.team != g.tip) {
                g.reset_now = 1;
                continue;
            }
            for (int j = 0; j < NUM_AGENTS; j++) {
                if (o.ag[j].held_ball == BALL_ID) {
                    o.ag[j].has_ball = 0;
                    o.ag[j].held_ball = PLACEHOLDER;
                    o.ag[j].cooldown = SIM_HZ;
                }
            }
            a.has_ball = 1;
            a.held_ball = BALL_ID;
            b.holder = AGENT_ID[i];
            b.grabbed = 1;
            b.in_flight = 0;
            b.vel = {0, 0, 0};
            b.sb_agent = PLACEHOLDER;
            b.sb_team = PLACEHOLDER;
            b.spv = 2;
            g.tip = (float)a.team;
            g.glive = 1;
        }
    }

    // 5. pass (src/game.cpp:243-270)
    for (int i = 0; i < NUM_AGENTS; i++) {
        Agent &a = o.ag[i];
        if (a.mask[2] == 0 || a.action[4] == 0) continue;
        if (b.holder == AGENT_ID[i]) {
            b.grabbed = 0;
            b.holder = PLACEHOLDER;
            a.has_ball = 0;
            a.held_ball = PLACEHOLDER;
            a.im_inb = 0;
            b.vel = quat_rotate(a.q, {0, 0.1f, 0});
            g.ginb = 0;
        }
    }

    // 6. shoot (src/game.cpp:273-407)
    for (int i = 0; i < NUM_AGENTS; i++) {
        Agent &a = o.ag[i];
        if (a.mask[3] == 0 || a.action[5] == 0) continue;
        Vec3 zone{0, 0, 0};
        for (int h = 0; h < NUM_HOOPS; h++)
            if ((h == 0 ? HOOP_ID0 : HOOP_ID1) != a.defend_hoop)
                zone = hoops.pos[h];
        Vec3 ideal = zone - a.pos;
        float intended = std::atan2(ideal.x, ideal.y);
        float dist = ideal.len();
        float dev = o.shot_u[i][0] * (DIST_DEV * dist);
        float d_def = INFINITY;
        for (int j = 0; j < NUM_AGENTS; j++)
            if (o.ag[j].team != a.team)
                d_def = std::min(d_def, (a.pos - o.ag[j].pos).len());
        if (d_def < 2.0f) dev += o.shot_u[i][1] * (DEF_DEV / (d_def + 0.1f));
        if (a.action[0] > 0) dev += o.shot_u[i][2] * (VEL_DEV * a.vel.len());
        float dir = intended + dev;
        Vec3 fv{std::sin(dir), std::cos(dir), 0};
        float t_along = ideal.dot(fv);
        bool going_in = false;
        if (t_along >= 0.0f) {
            float closest = ideal.len2() - t_along * t_along;
            going_in = closest <= ZONE_R * ZONE_R;
        }
        a.q = rot_between({0, 1, 0}, fv);
        if (b.holder == AGENT_ID[i]) {
            int32_t spv = shot_point_value(a.pos, zone);
            if (going_in) {
                b.sgi = 1;
                g.sbaskets += 1.0f;
            } else {
                a.reward -= 1.0f;
            }
            b.grabbed = 0;
            b.holder = PLACEHOLDER;
            a.has_ball = 0;
            a.held_ball = PLACEHOLDER;
            a.im_inb = 0;
            b.vel = fv * 0.1f;
            b.in_flight = 1;
            b.sb_agent = AGENT_ID[i];
            b.sb_team = a.team;
            b.spv = spv;
            b.lt_agent = AGENT_ID[i];
            b.lt_team = a.team;
        }
    }

    // 7. moveBall (src/game.cpp:82-125)
    for (int i = 0; i < NUM_AGENTS; i++)
        if (o.ag[i].has_ball == 1 && b.grabbed == 1 &&
            b.holder == AGENT_ID[i])
            b.pos = o.ag[i].pos;
    if (!(b.vel.len() == 0.0f || b.grabbed == 1)) {
        b.pos.x = std::clamp(b.pos.x + b.vel.x, 0.0f, cfg.grid_w);
        b.pos.y = std::clamp(b.pos.y + b.vel.y, 0.0f, cfg.grid_h);
        b.pos.z = b.pos.z + b.vel.z;
    }

    // 8. updateCurrentShotPercentage (src/game.cpp:758-809)
    for (auto &a : o.ag) {
        if (a.has_ball == 0) {
            a.shot_pct = 0.0f;
            continue;
        }
        Vec3 att = (HOOP_ID0 != a.defend_hoop) ? hoops.pos[0] : hoops.pos[1];
        float dist = (att - a.pos).len();
        float d_def = INFINITY;
        for (auto &other : o.ag)
            if (other.team != a.team)
                d_def = std::min(d_def, (a.pos - other.pos).len());
        float dist_sd = DIST_DEV * dist;
        float def_sd = DEF_DEV / d_def + 1e-4f;
        float vel_sd = VEL_DEV * a.vel.len();
        float final_sd = std::sqrt(dist_sd * dist_sd / 3.0f +
                                   def_sd * def_sd / 3.0f +
                                   vel_sd * vel_sd / 3.0f);
        float max_make = std::atan(ZONE_R / dist);
        a.shot_pct = std::erf(max_make / final_sd / std::sqrt(2.0f));
    }

    // 9. score (src/game.cpp:873-953)
    for (int h = 0; h < NUM_HOOPS; h++) {
        int32_t hid = (h == 0) ? HOOP_ID0 : HOOP_ID1;
        float dx = b.pos.x - hoops.pos[h].x;
        float dy = b.pos.y - hoops.pos[h].y;
        if (std::sqrt(dx * dx + dy * dy) <= ZONE_R && b.in_flight == 1) {
            int32_t points = b.spv;
            int32_t inb_team = 0;
            for (int j = 0; j < NUM_AGENTS; j++) {
                Agent &a = o.ag[j];
                if (a.defend_hoop == hid) inb_team = a.team;
                if (AGENT_ID[j] == b.sb_agent)
                    a.stat_points +=
                        (a.defend_hoop == hid) ? -(float)points
                                               : (float)points;
            }
            Vec3 spot;
            if (hid == g.t0hoop) {
                g.t1score += (float)points;
                spot = {COURT_MIN_X, hoops.pos[h].y + PPM / 60.0f, 0};
            } else {
                g.t0score += (float)points;
                spot = {COURT_MAX_X, hoops.pos[h].y + PPM / 60.0f, 0};
            }
            g.sbaskets += 1.0f;
            b.in_flight = 0;
            b.vel = {0, 0, 0};
            b.sb_agent = PLACEHOLDER;
            b.sb_team = PLACEHOLDER;
            b.spv = 2;
            b.sgi = 0;
            if (g.is1v1 == 0) {
                b.pos = spot;
                Quat q = rot_between({0, 1, 0}, to_center(cfg, b.pos));
                assign_inbounder(cfg, o, inb_team, spot, q, false);
            } else {
                g.reset_now = 1;
            }
        }
    }

    // 10. outOfBounds (src/game.cpp:1055-1113)
    if ((b.pos.x < COURT_MIN_X || b.pos.x > COURT_MAX_X ||
         b.pos.y < COURT_MIN_Y || b.pos.y > COURT_MAX_Y) &&
        g.ginb == 0) {
        if (g.is1v1 == 1) {
            Agent *off = &o.ag[0];
            for (int i = 1; i < NUM_AGENTS; i++)
                if ((float)o.ag[i].team == g.tip) off = &o.ag[i];
            off->reward -= 100.0f;
            g.reset_now = 1;
        } else {
            b.in_flight = 0;
            b.vel = {0, 0, 0};
            g.glive = 0;
            int32_t new_team = 1 - b.lt_team;
            for (auto &a : o.ag) {
                if (a.has_ball == 1 && a.held_ball == BALL_ID) {
                    a.pos = a.pos + to_center(cfg, a.pos);
                    a.has_ball = 0;
                    a.held_ball = PLACEHOLDER;
                }
            }
            Quat q = rot_between({0, 1, 0}, to_center(cfg, b.pos));
            assign_inbounder(cfg, o, new_team, b.pos, q, true);
        }
    }

    // 11. updateLastTouch (src/game.cpp:1034-1051)
    for (int i = 0; i < NUM_AGENTS; i++) {
        if ((b.pos - o.ag[i].pos).len() <= 0.2f) {
            b.lt_agent = AGENT_ID[i];
            b.lt_team = o.ag[i].team;
        }
    }

    // 12. clock (src/game.cpp:992-1030)
    if (g.glive > 0 && g.gclock > 0.0f) {
        g.gclock -= DT;
        g.sclock -= DT;
    }
    if (g.ginb > 0) g.iclock -= DT;
    if (g.gclock <= 0.0f && g.glive > 0) {
        Agent *off = &o.ag[0];
        for (int i = 1; i < NUM_AGENTS; i++)
            if ((float)o.ag[i].team == g.tip) off = &o.ag[i];
        off->reward += 10.0f;
        g.reset_now = 1;
    }
    if (g.sclock < 0.0f) g.sclock = 0.0f;

    // 13. inboundViolation (src/game.cpp:1116-1157)
    if (g.ginb > 0 && g.iclock <= 0.0f) {
        int32_t new_team = 1 - (int32_t)g.tip;
        int32_t turnover_ball = PLACEHOLDER;
        g.glive = 0;
        for (auto &a : o.ag) {
            if (a.im_inb > 0) {
                turnover_ball = a.held_ball;
                a.im_inb = 0;
                a.has_ball = 0;
                a.held_ball = PLACEHOLDER;
                a.pos = a.pos + to_center(cfg, a.pos);
            }
        }
        if (turnover_ball != PLACEHOLDER && turnover_ball == BALL_ID) {
            b.grabbed = 0;
            b.holder = PLACEHOLDER;
            Quat q = rot_between({0, 1, 0}, to_center(cfg, b.pos));
            assign_inbounder(cfg, o, new_team, b.pos, q, true);
        }
    }

    // 14. reset (src/game.cpp:957-967)
    if (g.reset_now == 1) {
        reset_world(cfg, o);
        g.reset_now = 0;
    }

    // 15. updatePointsWorth (src/game.cpp:129-161)
    for (auto &a : o.ag) {
        Vec3 target = (HOOP_ID0 != a.defend_hoop) ? hoops.pos[0]
                                                  : hoops.pos[1];
        a.points_worth = shot_point_value(a.pos, target);
    }

    // 16. agentCollision (src/game.cpp:537-648)
    {
        Agent &A0 = o.ag[0];
        Agent &A1 = o.ag[1];
        Vec3 fa = quat_rotate(A0.q, {0, 1, 0});
        Vec3 ra{fa.y, -fa.x, 0};
        Vec3 fb = quat_rotate(A1.q, {0, 1, 0});
        Vec3 rb{fb.y, -fb.x, 0};
        Vec3 hwa = ra * (SHOULDER / 2), hda = fa * (DEPTH / 2);
        Vec3 hwb = rb * (SHOULDER / 2), hdb = fb * (DEPTH / 2);
        Vec3 va[4] = {A0.pos - hda + hwa, A0.pos - hda - hwa,
                      A0.pos + hda - hwa, A0.pos + hda + hwa};
        Vec3 vb[4] = {A1.pos - hdb + hwb, A1.pos - hdb - hwb,
                      A1.pos + hdb - hwb, A1.pos + hdb + hwb};
        Vec3 axes[4] = {ra.normalized(), fa.normalized(), rb.normalized(),
                        fb.normalized()};
        bool colliding = true;
        float min_ov = INFINITY;
        Vec3 mtv{0, 0, 0};
        for (auto &ax : axes) {
            float pa_min = INFINITY, pa_max = -INFINITY;
            float pb_min = INFINITY, pb_max = -INFINITY;
            for (int k = 0; k < 4; k++) {
                pa_min = std::min(pa_min, va[k].dot(ax));
                pa_max = std::max(pa_max, va[k].dot(ax));
                pb_min = std::min(pb_min, vb[k].dot(ax));
                pb_max = std::max(pb_max, vb[k].dot(ax));
            }
            if (!(pa_max > pb_min && pb_max > pa_min)) {
                colliding = false;
                break;
            }
            float ov = std::min(pa_max, pb_max) - std::max(pa_min, pb_min);
            if (ov < min_ov) {
                min_ov = ov;
                mtv = ax;
            }
        }
        if (colliding) {
            if (cfg.tag_mode && g.tip == (float)A0.team) {
                A0.reward -= 10.0f;
                A1.reward += 10.0f;
                g.reset_now = 1;
            }
            Vec3 c2c = A1.pos - A0.pos;
            if (c2c.dot(mtv) < 0) mtv = mtv * -1.0f;
            Vec3 corr = mtv * (min_ov * 0.5f);
            A0.pos = A0.pos - corr;
            A1.pos = A1.pos + corr;
        }
    }

    // 17. hardCodeDefense (src/game.cpp:651-755)
    for (auto &a : o.ag) {
        if (g.tip == (float)a.team) {
            a.action[0] = 0;
            continue;
        }
        a.action[3] = 1;
        Vec3 guard{0, 0, 0};
        bool found = false;
        for (auto &off : o.ag) {
            if (off.has_ball == 1 && !found) {
                for (int h = 0; h < NUM_HOOPS; h++) {
                    if (a.defend_hoop == ((h == 0) ? HOOP_ID0 : HOOP_ID1)) {
                        Vec3 hd = hoops.pos[h] - off.pos;
                        guard = hd.len2() > 1e-6f
                                    ? off.pos + hd.normalized() * GUARD_DIST
                                    : off.pos;
                        found = true;
                    }
                }
            }
        }
        if (!found) {
            a.action[0] = 0;
            continue;
        }
        float interp = a.reaction * DT;
        a.target = a.target + (guard - a.target) * interp;
        Vec3 mv = a.target - a.pos;
        if (mv.len2() < 0.01f) {
            a.action[0] = 0;
            continue;
        }
        Vec3 desired = mv.normalized();
        const float dirs[8][2] = {{0, -1}, {1, -1}, {1, 0}, {1, 1},
                                  {0, 1}, {-1, 1}, {-1, 0}, {-1, -1}};
        float best_dot = -2.0f;
        int best = 0;
        for (int k = 0; k < 8; k++) {
            float n = std::sqrt(dirs[k][0] * dirs[k][0] +
                                dirs[k][1] * dirs[k][1]);
            float cur = desired.x * dirs[k][0] / n + desired.y * dirs[k][1] / n;
            if (cur > best_dot) {
                best_dot = cur;
                best = k;
            }
        }
        a.action[0] = 1;
        a.action[1] = best;
        Vec3 ov = quat_rotate(a.q, {0, 1, 0});
        float ang = std::acos(std::clamp(ov.dot(desired), -1.0f, 1.0f));
        if (ang > (float)M_PI / 8.0f) {
            float cr = ov.x * mv.y - ov.y * mv.x;
            a.action[2] = cr < 0 ? -1 : (cr > 0 ? 1 : 0);
        } else {
            a.action[2] = 0;
        }
    }

    // 18. fillObservations (src/game.cpp:1175-1461)
    {
        int32_t inbounder = -1;
        for (int j = 0; j < NUM_AGENTS; j++)
            if (o.ag[j].im_inb > 0) inbounder = AGENT_ID[j];
        for (int i = 0; i < NUM_AGENTS; i++) {
            Agent &a = o.ag[i];
            float *obs = obs_out;  // rows are strided by W
            size_t base = (size_t)i * 128;
            int idx = 0;
            auto put = [&](float v) {
                obs[(base + idx) * W + w] = v;
                idx++;
            };
            auto put3 = [&](const Vec3 &v) {
                put(v.x);
                put(v.y);
                put(v.z);
            };
            Vec3 att = (HOOP_ID0 != a.defend_hoop) ? hoops.pos[0]
                                                   : hoops.pos[1];
            Vec3 dfd = (HOOP_ID0 == a.defend_hoop) ? hoops.pos[0]
                                                   : hoops.pos[1];
            put(g.gclock);
            put(g.sclock);
            put(g.period);
            put((float)g.ginb);
            put(g.iclock);
            if (a.team == 0) {
                put(g.t0score);
                put(g.t1score);
            } else {
                put(g.t1score);
                put(g.t0score);
            }
            put3(b.pos);
            put3(b.vel);
            put((float)b.grabbed);
            put((float)b.in_flight);
            put((float)b.spv);
            put((float)b.lt_team);
            put3(att);
            put3(dfd);
            auto block = [&](Agent &t, const Vec3 &hoop, bool self) {
                put3(t.pos);
                if (self) {
                    put3({0, 0, 0});
                    put(0);
                } else {
                    Vec3 rel = t.pos - a.pos;
                    if (rel.len2() > 1e-6f) put3(rel.normalized());
                    else put3({0, 0, 0});
                    put(rel.len());
                }
                put(t.q.w);
                put(t.q.x);
                put(t.q.y);
                put(t.q.z);
                Vec3 ov = quat_rotate(t.q, {0, 1, 0});
                put3(ov);
                float dot = 0;
                if (t.vel.len2() > 1e-6f) {
                    Vec3 vn = t.vel.normalized();
                    put3(vn);
                    dot = vn.dot(ov);
                } else {
                    put3({0, 0, 0});
                }
                put(t.vel.len());
                put(dot);
                put(dot <= 0.8f ? 0.1f : 1.0f);
                Vec3 dh = hoop - t.pos;
                if (dh.len() > 1e-6f) put3(dh.normalized());
                else put3({0, 0, 0});
                put(dh.len());
                Vec3 db = b.pos - t.pos;
                if (db.len() > 1e-6f) put3(db.normalized());
                else put3({0, 0, 0});
                put(db.len());
                put((float)t.im_inb);
                put(t.cooldown);
                put(t.max_speed);
                put(t.quickness);
                put(t.shooting);
                put(t.ft_pct);
                put(t.reaction);
                put(t.shot_pct);
                put((float)t.points_worth);
                put((float)t.has_ball);
            };
            block(a, att, true);
            for (int j = 0; j < NUM_AGENTS; j++) {
                if (j == i) continue;
                block(o.ag[j], dfd, false);
            }
            for (int j = 0; j < NUM_AGENTS; j++)
                put(AGENT_ID[j] == b.holder ? 1.0f : 0.0f);
            for (int j = 0; j < NUM_AGENTS; j++)
                put(AGENT_ID[j] == inbounder ? 1.0f : 0.0f);
            while (idx < 128) put(0.0f);
        }
    }

    // 19. reward (src/game.cpp:811-870)
    for (int i = 0; i < NUM_AGENTS; i++) {
        Agent &a = o.ag[i];
        Agent &other = o.ag[1 - i];
        float dist_other = (other.pos - a.pos).len();
        if ((float)a.team == g.tip) {
            if (g.gclock > 5.0f) {
                if (b.sb_agent == AGENT_ID[i] && b.sgi == 1)
                    a.reward += (float)b.spv;
                else if (b.sb_agent == AGENT_ID[i] && b.sgi == 0 &&
                         b.in_flight == 1)
                    a.reward -= 1.0f;
                a.reward += a.shot_pct;
            }
        } else {
            a.reward -= 1.0f;
            a.reward += std::exp(-0.4f * dist_other);
        }
    }
}

}  // namespace

extern "C" {

// One lockstep tick for all worlds.  sf: (N_F32_ROWS, W) row-major;
// si: (N_I32_ROWS, W); noise: (N_NOISE_ROWS, W); obs_out: (N_OBS_ROWS, W).
void mbb_step(float *sf, int32_t *si, const float *noise, float *obs_out,
              int64_t n_worlds, float grid_w, float grid_h, float start_x,
              float start_y, float time_per_period, float shot_clock,
              int32_t tag_mode, int32_t n_threads) {
    Config cfg{grid_w, grid_h, start_x, start_y, time_per_period,
               shot_clock, tag_mode, n_threads};
    const size_t W = (size_t)n_worlds;
    auto run_range = [&](size_t lo, size_t hi) {
        World o;
        for (size_t w = lo; w < hi; w++) {
            load_world(sf, si, noise, W, w, o);
            step_world(cfg, o, obs_out, W, w);
            store_world(sf, si, W, w, o);
        }
    };
    int nt = std::max(1, (int)n_threads);
    if (nt == 1 || W < 256) {
        run_range(0, W);
        return;
    }
    std::vector<std::thread> threads;
    size_t chunk = (W + nt - 1) / nt;
    for (int t = 0; t < nt; t++) {
        size_t lo = (size_t)t * chunk;
        size_t hi = std::min(W, lo + chunk);
        if (lo >= hi) break;
        threads.emplace_back(run_range, lo, hi);
    }
    for (auto &th : threads) th.join();
}

int32_t mbb_n_f32_rows() { return MBB_N_F32_ROWS; }
int32_t mbb_n_i32_rows() { return MBB_N_I32_ROWS; }
int32_t mbb_n_obs_rows() { return MBB_N_OBS_ROWS; }
int32_t mbb_n_noise_rows() { return MBB_N_NOISE_ROWS; }

}  // extern "C"
