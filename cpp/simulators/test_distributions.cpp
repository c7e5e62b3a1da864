// Samples every wire distribution type once per run — counterpart of
// pyprob_cpp's test_distributions, used to exercise the full codec
// (reference: tests/test_distributions_remote.py:16-25).

#include <vector>

#include "../ppx/ppx.h"

int main(int argc, char** argv) {
  const char* address = argc > 1 ? argv[1] : "tcp://*:5555";
  ppx::Model model("Distributions C++");
  model.serve(address, [](ppx::Model& m) {
    std::vector<double> out;
    out.push_back(m.sample(ppx::normal(1.0, 2.0), "d_normal").scalar());
    out.push_back(m.sample(ppx::uniform(0.0, 3.0), "d_uniform").scalar());
    out.push_back(
        m.sample(ppx::categorical({0.2, 0.3, 0.5}), "d_categorical").scalar());
    out.push_back(m.sample(ppx::poisson(4.0), "d_poisson").scalar());
    out.push_back(m.sample(ppx::bernoulli(0.3), "d_bernoulli").scalar());
    out.push_back(m.sample(ppx::beta(2.0, 3.0), "d_beta").scalar());
    out.push_back(m.sample(ppx::exponential(2.0), "d_exponential").scalar());
    out.push_back(m.sample(ppx::gamma(2.0, 3.0), "d_gamma").scalar());
    out.push_back(m.sample(ppx::log_normal(0.0, 1.0), "d_log_normal").scalar());
    out.push_back(m.sample(ppx::binomial(10.0, 0.4), "d_binomial").scalar());
    out.push_back(m.sample(ppx::weibull(1.0, 2.0), "d_weibull").scalar());
    return ppx::Tensor(out);
  });
  return 0;
}
