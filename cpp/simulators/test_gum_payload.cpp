// GUM simulator parameterized by the Run payload (pyprob_tpu PPX
// extension): the payload tensor, when present, supplies
// [prior_mean, prior_stddev] per inference call — conditioning the
// simulator without named observes.  With a reference-style empty Run the
// model behaves exactly like test_gum.

#include <cmath>
#include <cstdio>

#include "../ppx/ppx.h"

int main(int argc, char** argv) {
  const char* address = argc > 1 ? argv[1] : "tcp://*:5555";
  ppx::Model model("Gaussian with unknown mean C++ (payload)");
  model.serve(address, [](ppx::Model& m) {
    double prior_mean = 1.0, prior_stddev = std::sqrt(5.0);
    if (m.has_payload()) {
      const ppx::Tensor& p = m.payload();
      prior_mean = p.data[0];
      if (p.data.size() > 1) prior_stddev = p.data[1];
    }
    double likelihood_stddev = std::sqrt(2.0);
    double mu =
        m.sample(ppx::normal(prior_mean, prior_stddev), "mu_addr").scalar();
    auto likelihood = ppx::normal(mu, likelihood_stddev);
    m.observe(likelihood, "obs0_addr", "obs0");
    m.observe(likelihood, "obs1_addr", "obs1");
    return ppx::Tensor(mu);
  });
  return 0;
}
