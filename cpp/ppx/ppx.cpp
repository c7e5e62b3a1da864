#include "ppx.h"

#include <cstdio>
#include <stdexcept>

#include "zmq_shim.h"

namespace ppx {

// ---------------------------------------------------------------------------
// distribution constructors
// ---------------------------------------------------------------------------

static Distribution make1(DistributionType t, const char* f0, Tensor v0) {
  Distribution d;
  d.type = t;
  d.params.emplace_back(f0, std::move(v0));
  return d;
}

static Distribution make2(DistributionType t, const char* f0, Tensor v0,
                          const char* f1, Tensor v1) {
  Distribution d;
  d.type = t;
  d.params.emplace_back(f0, std::move(v0));
  d.params.emplace_back(f1, std::move(v1));
  return d;
}

Distribution normal(double mean, double stddev) {
  return make2(DIST_Normal, "mean", mean, "stddev", stddev);
}
Distribution uniform(double low, double high) {
  return make2(DIST_Uniform, "low", low, "high", high);
}
Distribution categorical(const std::vector<double>& probs) {
  return make1(DIST_Categorical, "probs", Tensor(probs));
}
Distribution poisson(double rate) { return make1(DIST_Poisson, "rate", rate); }
Distribution bernoulli(double probs) {
  return make1(DIST_Bernoulli, "probs", probs);
}
Distribution beta(double c1, double c0) {
  return make2(DIST_Beta, "concentration1", c1, "concentration0", c0);
}
Distribution exponential(double rate) {
  return make1(DIST_Exponential, "rate", rate);
}
Distribution gamma(double concentration, double rate) {
  return make2(DIST_Gamma, "concentration", concentration, "rate", rate);
}
Distribution log_normal(double loc, double scale) {
  return make2(DIST_LogNormal, "loc", loc, "scale", scale);
}
Distribution binomial(double total_count, double probs) {
  return make2(DIST_Binomial, "total_count", total_count, "probs", probs);
}
Distribution weibull(double scale, double concentration) {
  return make2(DIST_Weibull, "scale", scale, "concentration", concentration);
}

// ---------------------------------------------------------------------------
// wire building helpers
// ---------------------------------------------------------------------------

static size_t build_tensor(minifb::Builder& b, const Tensor& t) {
  size_t shape_off = b.create_vector<int32_t>(t.shape);
  size_t data_off = b.create_vector<double>(t.data);
  b.start_table(2);
  b.slot_uoffset(0, data_off);
  b.slot_uoffset(1, shape_off);
  return b.end_table();
}

static size_t build_distribution(minifb::Builder& b, const Distribution& d) {
  std::vector<size_t> offs;
  for (const auto& p : d.params) offs.push_back(build_tensor(b, p.second));
  b.start_table(static_cast<int>(d.params.size()));
  for (size_t i = 0; i < offs.size(); i++)
    b.slot_uoffset(static_cast<int>(i), offs[i]);
  return b.end_table();
}

static void finish_message(minifb::Builder& b, uint8_t body_type,
                           size_t body_off) {
  b.start_table(2);
  b.slot_u8(0, body_type, 0);
  b.slot_uoffset(1, body_off);
  size_t msg = b.end_table();
  b.finish(msg, "PPXF");
}

static Tensor read_tensor(const minifb::Table& t) {
  Tensor out;
  if (!t.valid()) return out;
  out.data = t.get_vector<double>(0);
  out.shape = t.get_vector<int32_t>(1);
  return out;
}

// ---------------------------------------------------------------------------
// Model
// ---------------------------------------------------------------------------

Model::Model(const std::string& model_name, const std::string& system_name)
    : model_name_(model_name), system_name_(system_name) {
  zmq_context_ = zmq_ctx_new();
}

Model::~Model() {
  if (zmq_socket_) zmq_close(zmq_socket_);
  if (zmq_context_) zmq_ctx_term(zmq_context_);
}

void Model::reply(const minifb::Builder& b) {
  int rc = zmq_send(zmq_socket_, b.data(), b.size(), 0);
  if (rc < 0)
    throw std::runtime_error(std::string("zmq_send: ") +
                             zmq_strerror(zmq_errno()));
}

std::vector<uint8_t> Model::transact(const minifb::Builder& b) {
  reply(b);
  zmq_msg_t msg;
  zmq_msg_init(&msg);
  int rc = zmq_msg_recv(&msg, zmq_socket_, 0);
  if (rc < 0) {
    zmq_msg_close(&msg);
    throw std::runtime_error(std::string("zmq_msg_recv: ") +
                             zmq_strerror(zmq_errno()));
  }
  const uint8_t* data = static_cast<const uint8_t*>(zmq_msg_data(&msg));
  std::vector<uint8_t> out(data, data + zmq_msg_size(&msg));
  zmq_msg_close(&msg);
  return out;
}

Tensor Model::sample(const Distribution& dist, const std::string& address,
                     const std::string& name, bool control) {
  minifb::Builder b;
  size_t dist_off = build_distribution(b, dist);
  size_t name_off = b.create_string(name);
  size_t addr_off = b.create_string(address);
  b.start_table(5);
  b.slot_uoffset(0, addr_off);
  b.slot_uoffset(1, name_off);
  b.slot_u8(2, dist.type, 0);
  b.slot_uoffset(3, dist_off);
  b.slot_bool(4, control, true);
  size_t body = b.end_table();
  finish_message(b, BODY_Sample, body);

  auto resp = transact(b);
  minifb::Table msg = minifb::Table::root(resp.data(), resp.size());
  uint8_t body_type = msg.get_u8(0);
  if (body_type != BODY_SampleResult)
    throw std::runtime_error("expected SampleResult");
  return read_tensor(msg.get_table(1).get_table(0));
}

void Model::observe(const Distribution& dist, const Tensor& value,
                    const std::string& address, const std::string& name) {
  minifb::Builder b;
  size_t val_off = build_tensor(b, value);
  size_t dist_off = build_distribution(b, dist);
  size_t name_off = b.create_string(name);
  size_t addr_off = b.create_string(address);
  b.start_table(5);
  b.slot_uoffset(0, addr_off);
  b.slot_uoffset(1, name_off);
  b.slot_u8(2, dist.type, 0);
  b.slot_uoffset(3, dist_off);
  b.slot_uoffset(4, val_off);
  size_t body = b.end_table();
  finish_message(b, BODY_Observe, body);
  auto resp = transact(b);
  minifb::Table msg = minifb::Table::root(resp.data(), resp.size());
  if (msg.get_u8(0) != BODY_ObserveResult)
    throw std::runtime_error("expected ObserveResult");
}

void Model::observe(const Distribution& dist, const std::string& address,
                    const std::string& name) {
  minifb::Builder b;
  size_t dist_off = build_distribution(b, dist);
  size_t name_off = b.create_string(name);
  size_t addr_off = b.create_string(address);
  b.start_table(5);
  b.slot_uoffset(0, addr_off);
  b.slot_uoffset(1, name_off);
  b.slot_u8(2, dist.type, 0);
  b.slot_uoffset(3, dist_off);
  size_t body = b.end_table();
  finish_message(b, BODY_Observe, body);
  auto resp = transact(b);
  minifb::Table msg = minifb::Table::root(resp.data(), resp.size());
  if (msg.get_u8(0) != BODY_ObserveResult)
    throw std::runtime_error("expected ObserveResult");
}

void Model::tag(const Tensor& value, const std::string& address,
                const std::string& name) {
  minifb::Builder b;
  size_t val_off = build_tensor(b, value);
  size_t name_off = b.create_string(name);
  size_t addr_off = b.create_string(address);
  b.start_table(3);
  b.slot_uoffset(0, addr_off);
  b.slot_uoffset(1, name_off);
  b.slot_uoffset(2, val_off);
  size_t body = b.end_table();
  finish_message(b, BODY_Tag, body);
  auto resp = transact(b);
  minifb::Table msg = minifb::Table::root(resp.data(), resp.size());
  if (msg.get_u8(0) != BODY_TagResult)
    throw std::runtime_error("expected TagResult");
}

void Model::serve(const std::string& server_address, ForwardFunc forward,
                  long max_runs) {
  zmq_socket_ = zmq_socket(zmq_context_, ZMQ_REP);
  int linger = 100;
  zmq_setsockopt(zmq_socket_, ZMQ_LINGER, &linger, sizeof(linger));
  if (zmq_bind(zmq_socket_, server_address.c_str()) != 0)
    throw std::runtime_error(std::string("zmq_bind: ") +
                             zmq_strerror(zmq_errno()));
  std::printf("ppx (C++): %s serving at %s\n", model_name_.c_str(),
              server_address.c_str());
  std::fflush(stdout);

  long runs = 0;
  bool running = true;
  while (running) {
    zmq_msg_t msg;
    zmq_msg_init(&msg);
    int rc = zmq_msg_recv(&msg, zmq_socket_, 0);
    if (rc < 0) {
      zmq_msg_close(&msg);
      break;
    }
    const uint8_t* data = static_cast<const uint8_t*>(zmq_msg_data(&msg));
    std::vector<uint8_t> req(data, data + zmq_msg_size(&msg));
    zmq_msg_close(&msg);

    minifb::Table m = minifb::Table::root(req.data(), req.size());
    uint8_t body_type = m.get_u8(0);
    if (body_type == BODY_Handshake) {
      minifb::Builder b;
      size_t model_off = b.create_string(model_name_);
      size_t sys_off = b.create_string(system_name_);
      b.start_table(2);
      b.slot_uoffset(0, sys_off);
      b.slot_uoffset(1, model_off);
      size_t body = b.end_table();
      finish_message(b, BODY_HandshakeResult, body);
      reply(b);
    } else if (body_type == BODY_Run) {
      // optional per-run input tensor (pyprob_tpu PPX extension): slot 0
      // of the Run table; absent in reference-built messages
      payload_ = read_tensor(m.get_table(1).get_table(0));
      Tensor result = forward(*this);
      minifb::Builder b;
      size_t res_off = build_tensor(b, result);
      b.start_table(1);
      b.slot_uoffset(0, res_off);
      size_t body = b.end_table();
      finish_message(b, BODY_RunResult, body);
      reply(b);
      runs++;
      if (max_runs > 0 && runs >= max_runs) running = false;
    } else if (body_type == BODY_Reset) {
      minifb::Builder b;
      b.start_table(0);
      size_t body = b.end_table();
      finish_message(b, BODY_Reset, body);
      reply(b);
      running = false;
    } else {
      throw std::runtime_error("unexpected message body type");
    }
  }
}

}  // namespace ppx
