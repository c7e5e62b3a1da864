// GUM (gaussian unknown mean) PPX simulator — counterpart of the
// reference's pyprob_cpp test_gum binary
// (reference: tests/test_inference_remote.py:98).

#include <cmath>
#include <cstdio>

#include "../ppx/ppx.h"

int main(int argc, char** argv) {
  const char* address = argc > 1 ? argv[1] : "tcp://*:5555";
  ppx::Model model("Gaussian with unknown mean C++");
  model.serve(address, [](ppx::Model& m) {
    double prior_mean = 1.0, prior_stddev = std::sqrt(5.0);
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
