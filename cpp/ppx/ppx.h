// PPX model-server library (C++): lets a C++ simulator expose a
// probabilistic program to the pyprob_tpu inference engine over
// ZMQ + flatbuffers — the role of the reference's companion pyprob_cpp
// project (reference: Dockerfile:1, tests/test_inference_remote.py:98).
//
// Usage:
//   ppx::Model model("my model");
//   model.serve("ipc://@socket", [](ppx::Model& m) {
//     double mu = m.sample(ppx::normal(1.0, 2.236), "mu_addr");
//     m.observe(ppx::normal(mu, 1.414), 0.0, "obs0", "obs0");
//     return std::vector<double>{mu};
//   });

#pragma once

#include <cstdint>
#include <functional>
#include <map>
#include <string>
#include <vector>

#include "minifb.h"

namespace ppx {

// enums matching the wire schema (pyprob_tpu/ppx/ppx.fbs)
enum MessageBody : uint8_t {
  BODY_NONE = 0,
  BODY_Handshake = 1,
  BODY_HandshakeResult = 2,
  BODY_Run = 3,
  BODY_RunResult = 4,
  BODY_Sample = 5,
  BODY_SampleResult = 6,
  BODY_Observe = 7,
  BODY_ObserveResult = 8,
  BODY_Tag = 9,
  BODY_TagResult = 10,
  BODY_Reset = 11,
};

enum DistributionType : uint8_t {
  DIST_NONE = 0,
  DIST_Normal = 1,
  DIST_Uniform = 2,
  DIST_Categorical = 3,
  DIST_Poisson = 4,
  DIST_Bernoulli = 5,
  DIST_Beta = 6,
  DIST_Exponential = 7,
  DIST_Gamma = 8,
  DIST_LogNormal = 9,
  DIST_Binomial = 10,
  DIST_Weibull = 11,
};

struct Tensor {
  std::vector<double> data;
  std::vector<int32_t> shape;

  Tensor() {}
  Tensor(double scalar) : data{scalar} {}
  Tensor(std::vector<double> d) : data(std::move(d)) {
    shape.push_back(static_cast<int32_t>(data.size()));
  }
  double scalar() const { return data.empty() ? 0.0 : data[0]; }
};

struct Distribution {
  DistributionType type = DIST_NONE;
  // field name -> tensor, in the slot order of DIST_FIELDS (ppx.fbs)
  std::vector<std::pair<std::string, Tensor>> params;
};

Distribution normal(double mean, double stddev);
Distribution uniform(double low, double high);
Distribution categorical(const std::vector<double>& probs);
Distribution poisson(double rate);
Distribution bernoulli(double probs);
Distribution beta(double c1, double c0);
Distribution exponential(double rate);
Distribution gamma(double concentration, double rate);
Distribution log_normal(double loc, double scale);
Distribution binomial(double total_count, double probs);
Distribution weibull(double scale, double concentration);

class Model {
 public:
  explicit Model(const std::string& model_name,
                 const std::string& system_name = "pyprob_tpu cpp");
  ~Model();

  // Called from the forward function:
  Tensor sample(const Distribution& dist, const std::string& address = "",
                const std::string& name = "", bool control = true);
  void observe(const Distribution& dist, const Tensor& value,
               const std::string& address = "", const std::string& name = "");
  // unconditioned observe (value supplied by the engine / sampled)
  void observe(const Distribution& dist, const std::string& address = "",
               const std::string& name = "");
  void tag(const Tensor& value, const std::string& address = "",
           const std::string& name = "");

  using ForwardFunc = std::function<Tensor(Model&)>;

  // Bind the REP socket and serve Handshake/Run until Reset.
  void serve(const std::string& server_address, ForwardFunc forward,
             long max_runs = -1);

  // Per-run input tensor carried in the Run message (pyprob_tpu PPX
  // extension; empty when the controller sent a reference-style Run).
  const Tensor& payload() const { return payload_; }
  bool has_payload() const { return !payload_.data.empty(); }

 private:
  std::vector<uint8_t> transact(const minifb::Builder& b);
  void reply(const minifb::Builder& b);

  std::string model_name_;
  std::string system_name_;
  Tensor payload_;
  void* zmq_context_ = nullptr;
  void* zmq_socket_ = nullptr;
};

}  // namespace ppx
