// Golden-value generator for tests/test_cg_parity.py and
// tests/test_mfem_parity.py (checked in per round-3 verdict: the
// regeneration recipe must live in-repo).
//
// Solves -Delta u = 1, u = 0 on all boundary attributes, H1 order p,
// PARTIAL assembly, OperatorJacobiSmoother-preconditioned CG at
// rel_tol 1e-12, and prints: ndof, CG iterations, integral of u, ||u||_L2.
//
// Build (serial MFEM, see BASELINE.md):
//   cmake -S /root/reference -B /tmp/mfem-build -DCMAKE_BUILD_TYPE=Release \
//         -DMFEM_USE_MPI=NO -G Ninja && ninja -C /tmp/mfem-build mfem
//   g++ -O2 -std=c++17 tools/mfem_parity.cpp -I/root/reference \
//       -I/tmp/mfem-build -L/tmp/mfem-build -lmfem -o /tmp/mfem_parity
//
// Run:
//   /tmp/mfem_parity <mesh file> <order> <uniform refinements>

#include "mfem.hpp"
#include <iostream>

using namespace mfem;

int main(int argc, char *argv[])
{
   if (argc < 3)
   {
      std::cerr << "usage: " << argv[0] << " mesh order [refs]\n";
      return 1;
   }
   const char *mesh_file = argv[1];
   int order = std::atoi(argv[2]);
   int refs = (argc > 3) ? std::atoi(argv[3]) : 0;

   Mesh mesh(mesh_file, 1, 1);
   for (int l = 0; l < refs; l++) { mesh.UniformRefinement(); }

   H1_FECollection fec(order, mesh.Dimension());
   FiniteElementSpace fespace(&mesh, &fec);

   Array<int> ess_tdof_list, ess_bdr(mesh.bdr_attributes.Max());
   ess_bdr = 1;
   fespace.GetEssentialTrueDofs(ess_bdr, ess_tdof_list);

   ConstantCoefficient one(1.0);
   LinearForm b(&fespace);
   b.AddDomainIntegrator(new DomainLFIntegrator(one));
   b.Assemble();

   GridFunction x(&fespace);
   x = 0.0;

   BilinearForm a(&fespace);
   a.SetAssemblyLevel(AssemblyLevel::PARTIAL);
   a.AddDomainIntegrator(new DiffusionIntegrator(one));
   a.Assemble();

   OperatorPtr A;
   Vector B, X;
   a.FormLinearSystem(ess_tdof_list, x, b, A, X, B);

   OperatorJacobiSmoother M(a, ess_tdof_list);
   CGSolver cg;
   cg.SetRelTol(1e-12);
   cg.SetMaxIter(4000);
   cg.SetPrintLevel(0);
   cg.SetPreconditioner(M);
   cg.SetOperator(*A);
   cg.Mult(B, X);

   a.RecoverFEMSolution(X, b, x);

   // functionals: integral of u = (u, 1) via the same linear form pattern,
   // L2 norm via ComputeL2Error against the zero coefficient
   LinearForm w(&fespace);
   w.AddDomainIntegrator(new DomainLFIntegrator(one));
   w.Assemble();
   double integral = w(x);
   ConstantCoefficient zero(0.0);
   double l2 = x.ComputeL2Error(zero);

   std::cout.precision(16);
   std::cout << "ndof " << fespace.GetTrueVSize()
             << " iters " << cg.GetNumIterations()
             << " integral " << integral
             << " l2 " << l2 << std::endl;
   return 0;
}
